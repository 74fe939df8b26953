from pinn.problems import allencahn, burgers, kdv, schrodinger
