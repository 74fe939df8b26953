from pinn.models import mlp
from pinn.models.mlp import MLP, init_mlp, apply, taylor_apply
