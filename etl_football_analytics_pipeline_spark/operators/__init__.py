from .merge import insert_if_absent, merge_replace, upsert, MergeAudit

__all__ = ["insert_if_absent", "merge_replace", "upsert", "MergeAudit"]
