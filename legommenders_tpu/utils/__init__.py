from legommenders_tpu.utils.registry import Registry
from legommenders_tpu.utils.monitor import Monitor, Signal
from legommenders_tpu.utils.meaner import Meaner
