from .checkpoint import CheckpointStore, checkpointed_validate  # noqa: F401
