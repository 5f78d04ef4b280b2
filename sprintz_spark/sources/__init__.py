"""Sources: the synthetic Common-Crawl-style pages table and IO helpers."""
