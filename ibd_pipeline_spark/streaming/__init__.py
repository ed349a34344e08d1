"""Structured Streaming module: reference-parity weather pipeline
(Kafka → parse → window → aggregate → sink) with pluggable
source/sink adapters so every piece is testable without Kafka or
InfluxDB (SURVEY.md §7.3).
"""
