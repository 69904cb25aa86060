"""JSON Reference / JSON Pointer utilities.

Reimplements the behavior the reference gets from the gojsonreference /
gojsonpointer libraries (used throughout /root/reference/schemaPool.go and
schema.go): RFC 3986 resolution of ``$ref`` against the current ``$id``
scope, canonical string form with empty fragments stripped, and RFC 6901
pointer evaluation.
"""

from __future__ import annotations

from urllib.parse import unquote, urldefrag, urljoin

__all__ = ["normalize_ref", "resolve_ref", "split_fragment", "pointer_get", "is_canonical"]


def normalize_ref(ref: str) -> str:
    """Canonical string form: strip an empty trailing fragment ('x#' -> 'x')."""
    url, frag = urldefrag(ref)
    return f"{url}#{frag}" if frag else url


def resolve_ref(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` (RFC 3986 'Inherits' semantics)."""
    if not base:
        return normalize_ref(ref)
    return normalize_ref(urljoin(base, ref))


def split_fragment(ref: str) -> tuple[str, str]:
    url, frag = urldefrag(ref)
    return url, frag


def is_canonical(ref: str) -> bool:
    url, _ = urldefrag(ref)
    return "://" in url or url.startswith("file:")


class PointerError(KeyError):
    def __str__(self):
        # KeyError.__str__ reprs its argument, which would add quotes around
        # the message; the reference surfaces the bare text (reference
        # jsonPointer.go implGet "Object has no key '%s'").
        return self.args[0] if self.args else ""


def pointer_get(document, pointer: str):
    """Evaluate an RFC 6901 JSON pointer (fragment form, already unquoted
    of URL escaping) against a parsed document."""
    if pointer in ("", "/"):
        # "" addresses the whole doc; "/" addresses the "" key per RFC 6901,
        # but gojsonpointer treats "/" as the whole document too.
        if pointer == "":
            return document
    node = document
    parts = pointer.split("/")
    if parts and parts[0] == "":
        parts = parts[1:]
    for raw in parts:
        token = unquote(raw).replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict):
            if token not in node:
                raise PointerError(f"Object has no key '{token}'")
            node = node[token]
        elif isinstance(node, list):
            try:
                idx = int(token)
            except ValueError:
                raise PointerError(f"Invalid array index '{token}'") from None
            if not 0 <= idx < len(node):
                raise PointerError(f"Index {idx} out of bounds")
            node = node[idx]
        else:
            raise PointerError(f"Cannot descend into scalar with '{token}'")
    return node
