"""Sources: table readers and deterministic synthesis of the
Common-Crawl-style pages table (no external data; FIXTURES.md §2)."""
