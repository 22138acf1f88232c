"""Regenerate CONTRACT_HASHES.json: a normalized content hash per graded
query, covering (a) its oracle_sql text and (b) its q_* function source.

The rotation's CONTRACT_CHANGES.json hook (VERDICT r11 task 3) only works
if a contract change is NOTICED. This sidecar makes it mechanical
(tests/test_contract_guard.py): the committed sidecar must always match
the current registry, and any hash that differs from the sidecar at the
last driver-graded commit requires a CONTRACT_CHANGES entry that forces
the re-grade — forgetting either fails the suite.

Normalization keeps cosmetic edits from demanding re-grades: SQL comments
and whitespace runs are stripped from oracle text; function sources are
compared as ast.dump with docstrings removed (so comment/docstring edits
don't fire the guard, while any code or SQL change does).

Run: python scripts/gen_contract_hashes.py   (rewrites CONTRACT_HASHES.json)
"""
from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def normalize_sql(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", "", sql)
    return re.sub(r"\s+", " ", sql).strip()


def normalize_fn(fn) -> str:
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError):
        return repr(fn)
    tree = ast.parse(src)

    class _StripDoc(ast.NodeTransformer):
        def _strip(self, node):
            self.generic_visit(node)
            if (
                node.body
                and isinstance(node.body[0], ast.Expr)
                and isinstance(node.body[0].value, ast.Constant)
                and isinstance(node.body[0].value.value, str)
            ):
                node.body = node.body[1:] or [ast.Pass()]
            return node

        visit_FunctionDef = _strip
        visit_AsyncFunctionDef = _strip
        visit_ClassDef = _strip
        visit_Module = _strip

    return ast.dump(_StripDoc().visit(tree))


def compute() -> dict[str, str]:
    import __spark_entry__ as entry

    impls = entry._query_impls()
    oracles = entry.oracle_sql()
    out = {}
    for q, fn in impls.items():
        blob = normalize_fn(fn) + "\x00" + normalize_sql(oracles.get(q, ""))
        out[q] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return dict(sorted(out.items()))


def main() -> None:
    path = os.path.join(REPO, "CONTRACT_HASHES.json")
    hashes = compute()
    with open(path, "w") as f:
        json.dump(hashes, f, indent=1)
        f.write("\n")
    print(f"wrote {len(hashes)} hashes to {path}")


if __name__ == "__main__":
    main()
