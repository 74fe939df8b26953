from pinn.utils.config import HP, load_hp
from pinn.utils.logger import Logger
