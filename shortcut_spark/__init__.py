"""shortcut_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference indexed row store
(jonhoo/shortcut), extended with LLM-data-pipeline operators and designed
for 100 TB scale.

Layers:
- ``store``     — reference-shaped ``Store`` API (insert/find/delete/index)
                  over parquet + versioned manifest
- ``cmp``       — predicate language (``Condition``/``Comparison``/``Value``)
- ``idx``       — index specs + cost model
- ``plans``     — access-path selection / file pruning
- ``operators`` — dedup, similarity search, text analysis, multimodal
- ``functions`` — reusable column expressions (oracle-stable aggregates,
                  vector math, text features)
- ``sources``   — readers/writers registry
- ``streaming`` — structured-streaming equivalents for the events table
"""

from .cmp import Bound, Comparison, Condition, Value, between, col_eq, contains, eq
from .idx import BloomIndex, BTreeIndex, CompositeIndex, HashIndex, TrigramIndex
from .matview import MatView
from .session import get_spark
from .store import Store

__all__ = [
    "Bound",
    "Comparison",
    "Condition",
    "Value",
    "between",
    "col_eq",
    "contains",
    "eq",
    "BloomIndex",
    "BTreeIndex",
    "CompositeIndex",
    "HashIndex",
    "TrigramIndex",
    "get_spark",
    "MatView",
    "Store",
]

__version__ = "0.1.0"
