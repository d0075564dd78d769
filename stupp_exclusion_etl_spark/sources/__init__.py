"""Source-side ingest & normalization (the reference's scrape semantics)."""
