from .registry import (  # noqa: F401
    QUERIES, ORACLES, register, ordered_queries,
    DRIVER_WINDOW, DRIVER_DEMOTED, DRIVER_ROTATED, DRIVER_TAIL_NEW,
)

# Importing the plan modules registers their queries.
from . import relational  # noqa: F401,E402
from . import frontier_queries  # noqa: F401,E402
from . import pipeline_queries  # noqa: F401,E402
from . import crawl_queries  # noqa: F401,E402
from . import html_queries  # noqa: F401,E402
from . import robots_queries  # noqa: F401,E402
from . import geo_queries  # noqa: F401,E402
from . import media_queries  # noqa: F401,E402
from . import sampling_queries  # noqa: F401,E402
from . import curation_queries  # noqa: F401,E402
from . import image_queries  # noqa: F401,E402
