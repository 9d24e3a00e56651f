"""Utility helpers: artifacts, plotting, output-dir layout."""
