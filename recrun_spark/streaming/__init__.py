from .ingest import (extract_stream, run_available_now,  # noqa: F401
                     stream_documents)
