"""Query registry: every operator from SURVEY.md §2 registers here as a
(name, spark-plan, oracle-SQL) triple so the Spark implementation and its
DuckDB oracle can never drift apart — they live on the same decorator.

`oracle=None` marks genuinely non-SQL-expressible ops (LSH/minhash
randomized candidate generation, streaming state); the driver records a
weaker rows-only check for those (see __spark_entry__.py contract).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB over the same parquet views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect registers all queries exactly once.
    from . import queries  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_analytic  # noqa: F401
    from . import queries_temporal  # noqa: F401
    from . import queries_corpus  # noqa: F401
    from . import queries_scale  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_match  # noqa: F401
    from . import queries_graph  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
