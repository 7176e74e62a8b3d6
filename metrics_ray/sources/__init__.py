from .clips_source import read_clips, lance_available  # noqa: F401
