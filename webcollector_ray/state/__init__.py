from .seen import ShardedSeenFilter  # noqa: F401
from .frontier import CheckpointStore  # noqa: F401
