"""Concrete pipeline plans (compiled parse->enrich->route->aggregate
DataFrame DAGs) plus their independent DuckDB oracle SQL."""
