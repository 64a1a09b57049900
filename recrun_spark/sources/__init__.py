from .documents import read_documents  # noqa: F401
from .enrichment import enrich_articles  # noqa: F401
