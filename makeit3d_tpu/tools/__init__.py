"""Standalone tools mirroring the reference's DPT/ utility CLIs."""
