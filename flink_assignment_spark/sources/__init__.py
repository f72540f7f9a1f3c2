from .loaders import load_table, load_tables, read_commits_json, read_commit_geo_json

__all__ = ["load_table", "load_tables", "read_commits_json", "read_commit_geo_json"]
