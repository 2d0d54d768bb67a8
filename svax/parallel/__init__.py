"""L4' — data parallelism over a device mesh (SURVEY.md §3b).

The reference is single-process; the TPU rebuild's parallelism contract is
data parallelism with psum of GMM sufficient statistics (and NN gradients)
over ICI. This package owns the mesh construction and the shard_map wrapper
that turns an ``axis_name``-aware step into a sharded jitted step.
"""

from svax.parallel.mesh import data_parallel_step, make_data_mesh, shard_batch  # noqa: F401
