"""Data layer: signals, signal<->reference mappings, mapped-signal files,
chunk sampling."""
