from pinn.parallel.mesh import (
    make_mesh, make_mesh_2d, shard_points, shard_params_tp, replicate,
    pad_points_with_weights)
