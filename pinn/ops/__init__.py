from pinn.ops import diff
