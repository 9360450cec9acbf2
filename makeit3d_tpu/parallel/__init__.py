from .mesh import make_mesh, shard_train_step, batch_shardings
from .tp import make_tp_mesh, shard_guidance_params, tp_param_shardings
