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

__all__ = ["compile_re2", "translate_re2", "translate_re2_java",
           "JavaRegexDivergence"]

_UNICODE_CLASSES = {
    "L": r"a-zA-ZªµºÀ-ʯͰ-῿Ⰰ-퟿",
    "N": r"0-9٠-٩۰-۹०-९",
    "Nd": r"0-9٠-٩۰-۹०-९",
}

# RE2 POSIX classes (ASCII definitions, RE2 syntax.txt); Python re treats
# [[:alpha:]] as literal chars, so expand them during translation
_POSIX_CLASSES = {
    "alnum": r"0-9A-Za-z", "alpha": r"A-Za-z", "ascii": r"\x00-\x7f",
    "blank": r" \t", "cntrl": r"\x00-\x1f\x7f", "digit": r"0-9",
    "graph": r"\x21-\x7e", "lower": r"a-z", "print": r"\x20-\x7e",
    "punct": r"!-/:-@\[-`{-~", "space": r" \t\n\v\f\r", "upper": r"A-Z",
    "word": r"0-9A-Za-z_", "xdigit": r"0-9A-Fa-f",
}

# positive inline flag group carrying 'm' in its ENABLED section:
# (?m) (?im) (?m:...) (?m-i:...) — but not (?i-m:...), where m is only
# being disabled and the bare-'$' end-of-text rewrite stays correct
_INLINE_MULTILINE = re.compile(r"\(\?[a-zA-Z]*m[a-zA-Z]*(?:-[a-zA-Z]+)?[:)]")


class JavaRegexDivergence(ValueError):
    """Pattern uses syntax whose Java-regex meaning differs from RE2
    (inline (?m), class intersection &&, nested/POSIX classes) — the
    caller must route the schema to the exact interpreter path."""


def _posix_class(pattern: str, i: int):
    """If pattern[i:] starts a POSIX class ``[:name:]`` (inside a class),
    return (python_expansion, next_index); else None. Raises on negated or
    unknown names, like RE2 rejects unknown class names."""
    if not pattern.startswith("[:", i):
        return None
    j = pattern.find(":]", i + 2)
    if j < 0:
        return None  # literal '[' ':' — both RE2 and Python treat as chars
    name = pattern[i + 2:j]
    if name.startswith("^"):
        raise re.error(f"negated POSIX class [:{name}:] unsupported", pattern, i)
    cls = _POSIX_CLASSES.get(name)
    if cls is None:
        raise re.error(f"unknown POSIX class [:{name}:]", pattern, i)
    return cls, j + 2


def translate_re2(pattern: str) -> str:
    # RE2 (?m)$ and Python (?m)$ agree (line anchors); only the bare,
    # non-multiline '$' needs the end-of-text rewrite
    rewrite_dollar = not _INLINE_MULTILINE.search(pattern)
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if in_class:
            posix = _posix_class(pattern, i)
            if posix is not None:
                out.append(posix[0])
                i = posix[1]
                continue
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
        if c == "$" and not in_class and rewrite_dollar:
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

    Raises :class:`JavaRegexDivergence` for syntax Java parses differently
    from RE2 — inline ``(?m)`` (Java line terminators include \\r etc.),
    and inside character classes ``&&`` (Java intersection, RE2 literal),
    a nested ``[`` (Java nested class, RE2 literal) or a POSIX
    ``[:name:]`` (RE2 class, Java literal-ish) — callers route such
    schemas to the exact Python-interpreter path.
    """
    if _INLINE_MULTILINE.search(pattern):
        raise JavaRegexDivergence("inline (?m) flag")
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if in_class:
            if c == "&" and pattern.startswith("&&", i):
                raise JavaRegexDivergence("'&&' inside character class")
            if c == "[":
                raise JavaRegexDivergence(
                    "'[' inside character class (nested/POSIX class)")
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
