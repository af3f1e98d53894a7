from .generate import generate  # noqa: F401
from .merge import dedupe_by_key, merge_segments  # noqa: F401
from .execute import ExecuteStage  # noqa: F401
from .extract import extract_news_batch  # noqa: F401
