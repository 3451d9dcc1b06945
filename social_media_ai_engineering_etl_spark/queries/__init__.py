"""Query modules — importing this package populates the registry.

Import order IS driver grading order (the registry dict preserves insertion
order and the driver grades queries in registration order under a cap):
register the SURVEY §2 core first so a count- or time-capped correctness run
always grades the flagship inventory; the slower extension families
(dedup/similarity) come last.
"""

from . import pipeline_core  # noqa: F401  (q01 flagship first)
from . import row_transforms  # noqa: F401
from . import pairs_sampling  # noqa: F401
from . import rewards_scoring  # noqa: F401
from . import training_prep  # noqa: F401
from . import streaming_analytics  # noqa: F401
from . import star_rollups  # noqa: F401
from . import llm_stages  # noqa: F401
from . import ml_analytics  # noqa: F401
from . import warehouse_patterns  # noqa: F401
from . import curation  # noqa: F401  (extension families last)
from . import graph_analytics  # noqa: F401
from . import dedup_similarity  # noqa: F401
