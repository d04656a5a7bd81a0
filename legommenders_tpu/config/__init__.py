from legommenders_tpu.config.parser import (
    load_config,
    resolve,
    Obj,
    parse_four_way,
)
