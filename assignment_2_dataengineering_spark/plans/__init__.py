from .registry import QuerySpec, all_specs, get_spec, oracle_map, query_map

__all__ = ["QuerySpec", "all_specs", "get_spec", "oracle_map", "query_map"]
