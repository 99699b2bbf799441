"""Query modules — importing them registers entries in ``registry``."""

from . import reference_ops  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch_full  # noqa: F401
from . import tpch_partsupp  # noqa: F401
from . import events_ops  # noqa: F401
from . import text_ops  # noqa: F401
from . import dedup_ops  # noqa: F401
from . import vector_ops  # noqa: F401
from . import multimodal_ops  # noqa: F401
from . import extras  # noqa: F401
from . import sql_api  # noqa: F401
from . import functions_breadth  # noqa: F401
from . import skew_ops  # noqa: F401
from . import windows_arrays  # noqa: F401
from . import pipeline_ops  # noqa: F401
from . import etl_ops  # noqa: F401
from . import ingest_e2e  # noqa: F401
from . import ods_e2e  # noqa: F401
from . import nested_ops  # noqa: F401
from . import training_ops  # noqa: F401
from . import corpus_ops  # noqa: F401
from . import scale_ops  # noqa: F401
from . import quality_ops  # noqa: F401
from . import guard_ops  # noqa: F401
from . import graph_ops  # noqa: F401
from . import io_ops  # noqa: F401
