from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.models.inputers.concat import ConcatInputer
from legommenders_tpu.models.inputers.simple import SimpleInputer
from legommenders_tpu.models.inputers.single_column import SingleColumnInputer
