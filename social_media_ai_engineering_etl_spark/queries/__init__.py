"""Query modules — importing this package populates the registry."""

from . import dedup_similarity  # noqa: F401
from . import llm_stages  # noqa: F401
from . import ml_analytics  # noqa: F401
from . import pairs_sampling  # noqa: F401
from . import pipeline_core  # noqa: F401
from . import streaming_analytics  # noqa: F401
from . import training_prep  # noqa: F401
from . import rewards_scoring  # noqa: F401
from . import row_transforms  # noqa: F401
from . import star_rollups  # noqa: F401
