"""Sources & sinks: synthetic Common-Crawl-style ``pages`` corpus
(FIXTURES.md §1), the pinned html→text extractor, and loaders for the
driver-provided test tables."""
