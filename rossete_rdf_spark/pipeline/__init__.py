from .extract import extract_pages, extract_text_bytes  # noqa: F401
from .kg import load_triples, run_kg_pipeline  # noqa: F401
from .webpages import synth_pages  # noqa: F401
