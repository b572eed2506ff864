from whoosh_novo_ray.state.query_pool import QueryPool

__all__ = ["QueryPool"]
