from pinn.optim.adam import AdamRunner
from pinn.optim.lbfgs import LbfgsConfig, LbfgsState, lbfgs_init, make_lbfgs_run
