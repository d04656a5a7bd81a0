from legommenders_tpu.data.processors.base import BaseProcessor
from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.processors.mind import MINDProcessor
from legommenders_tpu.data.processors.xmind import XMINDProcessor
from legommenders_tpu.data.processors.recbench import RecBenchProcessor
