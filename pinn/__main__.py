"""``python -m pinn`` — see pinn.cli."""

import sys

from pinn.cli import main

sys.exit(main())
