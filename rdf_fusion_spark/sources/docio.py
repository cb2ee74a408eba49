"""Shared helpers for the document-at-a-time RDF readers."""

from __future__ import annotations


def read_doc(path: str) -> str:
    """Read a document file, or the concatenation of the part files of a
    Spark write.text output directory (what dump()/convert produce)."""
    import glob
    import os
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "part-*")))
        return "".join(open(p, encoding="utf-8").read() for p in parts)
    return open(path, encoding="utf-8").read()
