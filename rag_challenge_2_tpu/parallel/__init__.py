from .mesh import cpu_mesh, encoder_param_spec, make_mesh, shard_params
from .pipeline import pipeline_forward
from .sharded_search import make_sharded_topk, shard_rows, sharded_dense_topk
