from legommenders_tpu.data.processors.base import BaseProcessor
from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.processors.mind import MINDProcessor
