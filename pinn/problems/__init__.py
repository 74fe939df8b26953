from pinn.problems import burgers, schrodinger
