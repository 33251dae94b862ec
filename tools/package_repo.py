"""Dump the repo into a single markdown file (the reference's package.py:
an LLM-context tool with include/exclude globs).

Usage:
    python tools/package_repo.py [--output codebase_prompt.md]
        [--include '*.py' '*.md'] [--exclude 'tests/*']
"""

from __future__ import annotations

import argparse
import fnmatch
from pathlib import Path

DEFAULT_INCLUDE = ["*.py", "*.md", "*.cpp", "*.h", "Makefile"]
DEFAULT_EXCLUDE = ["native/build/*", "checkpoints/*", "runs/*",
                   "__pycache__/*", ".git/*", "*.png"]

LANG = {".py": "python", ".cpp": "cpp", ".h": "cpp", ".md": "markdown"}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=".")
    ap.add_argument("--output", default="codebase_prompt.md")
    ap.add_argument("--include", nargs="*", default=DEFAULT_INCLUDE)
    ap.add_argument("--exclude", nargs="*", default=DEFAULT_EXCLUDE)
    args = ap.parse_args(argv)

    root = Path(args.root).resolve()
    files = []
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        rel = p.relative_to(root).as_posix()
        if not any(fnmatch.fnmatch(p.name, g) or fnmatch.fnmatch(rel, g)
                   for g in args.include):
            continue
        if any(fnmatch.fnmatch(rel, g) for g in args.exclude):
            continue
        files.append((rel, p))

    out = [f"# Codebase dump: {root.name}", "",
           f"{len(files)} files.", ""]
    for rel, p in files:
        lang = LANG.get(p.suffix, "")
        out.append(f"## {rel}\n")
        out.append(f"```{lang}")
        try:
            out.append(p.read_text())
        except UnicodeDecodeError:
            out.append("<binary>")
        out.append("```")
        out.append("")
    Path(args.output).write_text("\n".join(out))
    print(f"[package_repo] wrote {args.output} ({len(files)} files)")


if __name__ == "__main__":
    main()
