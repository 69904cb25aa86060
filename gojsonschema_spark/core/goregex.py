"""RE2-compatible regex compilation on top of Python ``re``.

The reference validates ``pattern`` / ``patternProperties`` with Go's RE2
(reference schema.go:653-669, validation.go:749-759). RE2 and Python ``re``
differ in ways that change verdicts:

* RE2 ``\\d \\w \\s \\b`` are ASCII-only -> compile with ``re.ASCII``;
* RE2 ``$`` (no multiline flag) anchors at end-of-text only, while Python
  ``$`` also matches before a trailing newline -> rewrite bare ``$`` to
  ``\\Z``;
* RE2 ``\\z`` / Python ``\\Z`` both mean end-of-text -> rewrite;
* RE2 rejects backreferences and lookaround at compile time. We do not
  reject them (Python accepts), which only matters for schemas the
  reference would refuse to compile.

Unicode classes ``\\p{...}`` get a small translation table for the common
one-letter classes; anything else raises so the caller can surface a
compile error like RE2 would for unknown classes.
"""

from __future__ import annotations

import re

__all__ = ["compile_re2", "translate_re2"]

_UNICODE_CLASSES = {
    "L": r"a-zA-ZªµºÀ-ʯͰ-῿Ⰰ-퟿",
    "N": r"0-9٠-٩۰-۹०-९",
    "Nd": r"0-9٠-٩۰-۹०-९",
}


def translate_re2(pattern: str) -> str:
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "z" and not in_class:
                out.append(r"\Z")
                i += 2
                continue
            if nxt in ("p", "P") and i + 2 < n:
                # \p{X} or \pX
                if pattern[i + 2] == "{":
                    j = pattern.find("}", i + 3)
                    if j < 0:
                        raise re.error("unterminated \\p{", pattern, i)
                    name = pattern[i + 3 : j]
                    i = j + 1
                else:
                    name = pattern[i + 2]
                    i = i + 3
                cls = _UNICODE_CLASSES.get(name)
                if cls is None:
                    raise re.error(f"unsupported unicode class \\p{{{name}}}", pattern, i)
                neg = nxt == "P"
                if in_class:
                    if neg:
                        raise re.error("negated \\P inside class unsupported", pattern, i)
                    out.append(cls)
                else:
                    out.append(("[^" if neg else "[") + cls + "]")
                continue
            out.append(c)
            out.append(nxt)
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
            out.append(c)
            # leading ^ / ] literals
            j = i + 1
            if j < n and pattern[j] == "^":
                out.append("^")
                j += 1
            if j < n and pattern[j] == "]":
                out.append("\\]")
                j += 1
            i = j
            continue
        if c == "]" and in_class:
            in_class = False
            out.append(c)
            i += 1
            continue
        if c == "$" and not in_class:
            out.append(r"\Z")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def compile_re2(pattern: str):
    """Compile an RE2 pattern with Python ``re``, RE2 search semantics."""
    return re.compile(translate_re2(pattern), re.ASCII)


def translate_re2_java(pattern: str) -> str:
    """Rewrite an RE2 pattern for Java regex (Spark ``rlike``).

    Java and RE2 agree on ASCII ``\\d \\w \\s`` defaults and ``\\p{...}``;
    the one verdict-changing difference is the ``$`` anchor: Java ``$``
    (like Python's) also matches before a trailing newline, RE2 ``$``
    without (?m) matches end-of-text only -> rewrite bare ``$`` and RE2
    ``\\z`` to Java ``\\z``.
    """
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(c)
            out.append(pattern[i + 1])
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
            out.append(c)
            j = i + 1
            if j < n and pattern[j] == "^":
                out.append("^")
                j += 1
            if j < n and pattern[j] == "]":
                out.append("\\]")
                j += 1
            i = j
            continue
        if c == "]" and in_class:
            in_class = False
            out.append(c)
            i += 1
            continue
        if c == "$" and not in_class:
            out.append(r"\z")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)
