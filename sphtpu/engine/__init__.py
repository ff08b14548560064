from .config import EngineConfig, Params, State  # noqa: F401
from .step import make_chunk_runner, make_step  # noqa: F401
from .driver import run_simulation  # noqa: F401
