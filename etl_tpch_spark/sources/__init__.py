from .synthetic import SyntheticEventsDataSource, register_synthetic_source

__all__ = ["SyntheticEventsDataSource", "register_synthetic_source"]
