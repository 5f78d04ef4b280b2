"""Scalar/column functions: text extraction, language id, quality scoring,
token counting, fingerprinting. JVM built-ins where possible, Arrow
pandas UDFs where not."""
