"""Structured Streaming operators (SURVEY.md §2B Q52-Q60): file stream
sources, tumbling/sliding/session windows, watermarks, stateful
processing, stream-static joins — with synchronous-run helpers so the
same pipelines are testable to completion in batch-ish fashion
(``Trigger.AvailableNow`` + memory sink)."""
