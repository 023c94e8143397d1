"""Offline extraction pipeline: doc-gen4 -> parse -> informalize -> embed -> index."""
