"""Repo-root CLI shim: python main.py --ref_path ... --workspace ...

(reference invocation shape: README.md:67-88). The implementation lives
in makeit3d_tpu/main.py.
"""

from makeit3d_tpu.main import main

if __name__ == "__main__":
    main()
