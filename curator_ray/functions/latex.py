"""LaTeX source cleaning for ArXiv curation — stdlib only.

Implements the published RedPajama arXiv preparation rules (also used by
the reference's ``stages/text/download/arxiv/extract.py:74-160``):

- drop everything before the first section-like header
  (``\\chapter/\\part/\\section/.../\\subparagraph``) — papers without one
  clean to the empty string;
- strip ``%`` line comments and trailing in-line comments (a ``\\%`` is a
  literal percent, not a comment);
- drop everything from the first ``\\appendix`` / ``\\bibliography{...}`` /
  ``\\begin{thebibliography}`` / ``\\begin{references}`` on;
- inline-expand argument-less user macros collected from
  ``\\newcommand{\\x}{y}`` / ``\\def\\x{y}`` in any of the project's files.

A project = a list of tex-file strings (one arXiv submission may split
its source over many files); macros are collected across all files, then
each file is cleaned and the survivors concatenated with ``\\n``.
"""

from __future__ import annotations

import re

_SECTION_RE = re.compile(
    r"\\(?:chapter|part|section|subsection|subsubsection|paragraph|subparagraph)\*?(?:\[[^\]]*\])?\{",
)
_LINE_COMMENT_RE = re.compile(r"(?m)^%.*\n?")
_INLINE_COMMENT_RE = re.compile(r"(?m)(?<!\\)%.*$")
_BIB_RE = re.compile(
    r"(\\appendix|\\begin\{references\}|\\begin\{REFERENCES\}|\\begin\{thebibliography\}|\\bibliography\{[^}]*\}).*$",
    re.S,
)
_NEWCOMMAND_RE = re.compile(r"\\newcommand\*?\{(\\[a-zA-Z0-9]+)\}\{([^{}]*)\}", re.M)
_DEF_RE = re.compile(r"\\def\s*(\\[a-zA-Z0-9]+)\s*\{([^{}]*)\}", re.M)


def collect_macros(tex_files: list[str]) -> dict[str, str]:
    """Argument-less user macro definitions across a project's files."""
    macros: dict[str, str] = {}
    for content in tex_files:
        for reg in (_NEWCOMMAND_RE, _DEF_RE):
            for m in reg.finditer(content):
                macros[m.group(1)] = m.group(2)
    return macros


def clean_tex_file(content: str, macros: dict[str, str] | None = None) -> str:
    """Clean one tex file per the rules above; '' when no section header."""
    m = _SECTION_RE.search(content)
    if m is None:
        return ""
    content = content[m.start() :]
    content = _LINE_COMMENT_RE.sub("", content)
    content = _INLINE_COMMENT_RE.sub("", content)
    content = _BIB_RE.sub("", content)
    for name, value in (macros or {}).items():
        # only replace the macro where a non-word char follows so \xy is
        # not clobbered by \x
        content = re.sub(re.escape(name) + r"(?![a-zA-Z0-9])", value.replace("\\", "\\\\"), content)
    return content


def clean_latex_project(tex_files: list[str]) -> str | None:
    """Clean a whole submission; None when no file has a section header."""
    macros = collect_macros(tex_files)
    cleaned = [clean_tex_file(f, macros) for f in tex_files]
    cleaned = [c for c in cleaned if c]
    return "\n".join(cleaned) if cleaned else None
