"""SPARQL Protocol HTTP server (see server.py)."""

from .server import SparqlHttpServer

__all__ = ["SparqlHttpServer"]
