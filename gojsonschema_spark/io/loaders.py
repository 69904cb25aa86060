"""Driver-side schema/document loaders — API parity with the reference's
JSONLoader family (reference jsonLoader.go:97-386, SURVEY.md §2.1).

All loading happens on the DRIVER at compile time; executors never fetch
schemas. ``file://`` URIs resolve against the local filesystem;
``http(s)://`` URIs resolve against documents pre-registered in the
compiler's store, or — when the compiler was built with
``fetcher=http_fetcher()`` — via a live driver-side GET at compile time
(reference jsonLoader.go:180-204). The default remains store-only.
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlsplit

from ..core.compiler import SchemaCompiler
from ..core.errors import SchemaCompileError
from ..core.jsonvalue import Num, parse_json

__all__ = ["string_loader", "bytes_loader", "file_loader", "python_loader",
           "raw_loader", "load_reference", "compiler_with_dir",
           "http_fetcher"]


def http_fetcher(timeout: float = 10.0, max_bytes: int = 8 * 1024 * 1024):
    """Fetcher hook for ``SchemaCompiler(fetcher=...)``: resolves canonical
    http(s) ``$ref`` URLs with a driver-side GET at COMPILE time — the
    counterpart of the reference's live reference loader
    (jsonLoader.go:180-204; its test suite serves testdata/remotes/ on
    localhost:1234, jsonschema_test.go:129-135). Returns the raw JSON
    text; the compiler parses it with lexical numbers and caches it in
    the store, so each URL is fetched at most once per compiler.

    Executors never call this: schemas compile once on the driver and
    ship as a compiled graph. ``max_bytes`` bounds the response read — a
    schema document is KBs, and an unbounded read from a misconfigured
    URL must not exhaust driver memory."""
    from urllib.request import urlopen

    def fetch(url: str) -> str:
        scheme = urlsplit(url).scheme
        if scheme not in ("http", "https"):
            raise SchemaCompileError(
                f"http_fetcher only resolves http(s) URLs, got {url!r}")
        with urlopen(url, timeout=timeout) as resp:
            data = resp.read(max_bytes + 1)
        if len(data) > max_bytes:
            raise SchemaCompileError(
                f"schema document {url!r} exceeds max_bytes={max_bytes}")
        return data.decode("utf-8")

    return fetch


def string_loader(text: str):
    """reference NewStringLoader: parse an in-memory JSON string."""
    return parse_json(text)


def bytes_loader(data: bytes):
    """reference NewBytesLoader."""
    return parse_json(data.decode("utf-8"))


def file_loader(path: str):
    """reference NewReferenceLoader for file:// URIs."""
    with open(path, encoding="utf-8") as f:
        return parse_json(f.read())


def python_loader(value):
    """reference NewGoLoader: marshal a native value to JSON and reparse
    (normalizes exotic types; numbers become lexical)."""
    return parse_json(json.dumps(value))


def raw_loader(value):
    """reference NewRawLoader: wrap an already-decoded value verbatim."""
    return value


def load_reference(compiler: SchemaCompiler, uri: str):
    """Resolve a reference URI like the reference loader: file:// reads the
    filesystem, http(s):// must be pre-registered via add_schema()."""
    parts = urlsplit(uri)
    if parts.scheme == "file" or not parts.scheme:
        path = parts.path if parts.scheme == "file" else uri
        doc = file_loader(path)
        compiler.store[uri.split("#")[0]] = doc
        return doc
    base = uri.split("#")[0]
    if base not in compiler.store:
        raise SchemaCompileError(
            f"{uri!r} is not registered (network fetch is not performed)")
    return compiler.store[base]


def compiler_with_dir(directory: str, base_url: str, **kw) -> SchemaCompiler:
    """Register every *.json under ``directory`` beneath ``base_url`` —
    the offline equivalent of the reference test suite's localhost:1234
    remotes server (jsonschema_test.go:129-135)."""
    compiler = SchemaCompiler(**kw)
    for dirpath, _, files in os.walk(directory):
        for name in files:
            if name.endswith(".json"):
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, directory).replace(os.sep, "/")
                compiler.store[base_url.rstrip("/") + "/" + rel] = file_loader(full)
    return compiler
