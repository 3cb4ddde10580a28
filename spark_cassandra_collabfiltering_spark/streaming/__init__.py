"""Structured Streaming operators over the events stream.

The reference declares spark-streaming as a dependency but never
imports it (SURVEY §2.9 — pom.xml:28-32, no source usage); streaming
here is capability parity-plus, built on Structured Streaming so the
batch and stream plans share Catalyst semantics.
"""
