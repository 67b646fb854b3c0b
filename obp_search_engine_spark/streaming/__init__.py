"""Structured-Streaming wrappers. The reference is a polling batch loop
(crawler/crawling/crawler.go:181-240) — streaming is an optional driver for
the same round function, not a semantic requirement (SURVEY.md §2.9)."""
