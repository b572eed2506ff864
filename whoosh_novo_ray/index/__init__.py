from whoosh_novo_ray.index.build import IndexConfig, build_index
from whoosh_novo_ray.index.nrt import AsyncWriter, BufferedWriter
from whoosh_novo_ray.index.segment import Index, TermRow

__all__ = [
    "IndexConfig",
    "build_index",
    "Index",
    "TermRow",
    "BufferedWriter",
    "AsyncWriter",
]
