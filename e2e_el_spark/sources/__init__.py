"""Sources & sinks (SURVEY.md §2.1): text-format parsers re-expressed as
DataFrame transforms over spark.read.text, plus JSONL readers/writers."""
