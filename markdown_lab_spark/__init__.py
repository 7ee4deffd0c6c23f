"""markdown_lab_spark — PySpark-native web-crawl + HTML→Markdown engine.

A from-scratch reimplementation of ursisterbtw/markdown_lab's capabilities
as idiomatic PySpark dataflow: a URL frontier (bloom/cuckoo URL-seen,
per-host politeness, robots) over Common-Crawl-style page tables, with
Arrow-vectorized HTML→Markdown/JSON/XML conversion and RAG chunking.
"""

__version__ = "0.1.0"
