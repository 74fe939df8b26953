from pinn.problems import allencahn, burgers, kdv, navierstokes, schrodinger
