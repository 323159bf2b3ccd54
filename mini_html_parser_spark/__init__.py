"""mini_html_parser_spark — a PySpark-native main-content extraction
and corpus-analytics engine (capabilities of SaulLu/mini-html-parser,
re-expressed Spark-first per SURVEY.md)."""

__version__ = "0.1.0"
