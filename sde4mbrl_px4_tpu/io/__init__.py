from sde4mbrl_px4_tpu.io.config import load_yaml_config  # noqa: F401
from sde4mbrl_px4_tpu.io.px4_params import (  # noqa: F401
    parse_params_file,
    dump_params_file,
    diff_params,
)
from sde4mbrl_px4_tpu.io.ulog import (  # noqa: F401
    read_ulog,
    write_ulog,
    ulog_to_flight_log,
    flight_log_to_ulog,
)
