from legommenders_tpu.data.vocab import Vocab, VocabHub
from legommenders_tpu.data.token_store import TokenStore, UNSET
from legommenders_tpu.data.column_map import ColumnMap
