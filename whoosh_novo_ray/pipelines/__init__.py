from whoosh_novo_ray.pipelines.registry import oracle_sql, queries

__all__ = ["queries", "oracle_sql"]
