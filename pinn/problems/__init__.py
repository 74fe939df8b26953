from pinn.problems import burgers, kdv, schrodinger
