"""One-time extraction of test vectors from the reference's test sources.

Parses tests/solver_tests.rs of the reference crate and emits JSON golden
files (b vector, expected x, tolerance, solver call) so our pytest suite can
assert the same solutions to the same tolerances (SURVEY.md §4 "porting
implication"). Pure data extraction — no code is ported here.

Usage: python tests/extract_goldens.py   (writes tests/golden/*.json)
"""

from __future__ import annotations

import json
import os
import re

REF = "/root/reference/tests/solver_tests.rs"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def split_tests(src: str):
    """Yield (name, body) for each #[test] fn."""
    pat = re.compile(r"fn\s+(\w+)\s*\(\s*\)\s*\{")
    for m in pat.finditer(src):
        name = m.group(1)
        depth = 1
        i = m.end()
        while depth > 0 and i < len(src):
            if src[i] == "{":
                depth += 1
            elif src[i] == "}":
                depth -= 1
            i += 1
        yield name, src[m.end() : i - 1]


def parse_vec(body: str, var: str):
    """Extract `let [mut] VAR = vec![ ... ];` as a list of floats."""
    m = re.search(rf"let\s+(?:mut\s+)?{var}\s*=\s*vec!\[", body)
    if not m:
        return None
    i = m.end()
    depth = 1
    while depth > 0:
        if body[i] == "[":
            depth += 1
        elif body[i] == "]":
            depth -= 1
        i += 1
    inner = body[m.end() : i - 1]
    if "vec!" in inner:  # 2-D literal, skip (dense matrices handled separately)
        return None
    # strip comments
    inner = re.sub(r"//[^\n]*", "", inner)
    vals = [v.strip() for v in inner.split(",")]
    vals = [v for v in vals if v]
    try:
        # Rust literals like `2.` parse directly with Python's float()
        return [float(v) for v in vals]
    except ValueError:
        return None


def parse_dense(body: str, var: str):
    """Extract a 2-D `vec![vec![...], ...]` literal as list of rows."""
    m = re.search(rf"let\s+(?:mut\s+)?{var}\s*=\s*vec!\[", body)
    if not m:
        return None
    i = m.end()
    depth = 1
    while depth > 0:
        if body[i] == "[":
            depth += 1
        elif body[i] == "]":
            depth -= 1
        i += 1
    inner = body[m.end() : i - 1]
    if "vec!" not in inner:
        return None
    rows = []
    for rm in re.finditer(r"vec!\[([^\]]*)\]", inner):
        txt = re.sub(r"//[^\n]*", "", rm.group(1))
        rows.append([float(v.strip()) for v in txt.split(",") if v.strip()])
    return rows


BASIC = "/root/reference/tests/basic_tests.rs"


def parse_inline_vec(txt: str):
    """Parse a bare `vec![...]` content string into floats."""
    txt = re.sub(r"//[^\n]*", "", txt)
    vals = [v.strip() for v in txt.split(",") if v.strip()]
    return [float(v) for v in vals]


def extract_basic():
    """Extract dense input matrices + qr golden arrays from basic_tests.rs."""
    src = open(BASIC).read()
    out = {}
    for name, body in split_tests(src):
        rec = {}
        # all dense 2-D literals by variable name
        for m in re.finditer(r"let\s+(?:mut\s+)?(\w+)\s*=\s*vec!\[\s*(?://[^\n]*\s*)?vec!", body):
            d = parse_dense(body, m.group(1))
            if d:
                rec[f"dense_{m.group(1)}"] = d
        # qr golden arrays: assert_eq!(EXPR, vec![...]) and assert_eq_f_vec
        for gm in re.finditer(
            r"assert_eq!\(\s*(qr\.\w+(?:\.\w+)?|sym\.\w+)(?:\.unwrap\(\))?,\s*vec!\[",
            body,
        ):
            i = gm.end()
            depth = 1
            while depth > 0:
                if body[i] == "[":
                    depth += 1
                elif body[i] == "]":
                    depth -= 1
                i += 1
            key = gm.group(1).replace(".", "_")
            rec[key] = parse_inline_vec(body[gm.end() : i - 1])
        for gm in re.finditer(
            r"assert_eq_f_vec\(&(qr\.\w+\.\w+|qr\.\w+),\s*&vec!\[", body
        ):
            i = gm.end()
            depth = 1
            while depth > 0:
                if body[i] == "[":
                    depth += 1
                elif body[i] == "]":
                    depth -= 1
                i += 1
            key = gm.group(1).replace(".", "_")
            rec[key] = parse_inline_vec(body[gm.end() : i - 1])
        # scalar golden asserts like assert_eq!(sym.m2, 50);
        for gm in re.finditer(r"assert_eq!\(\s*(sym\.\w+|qr\.\w+\.\w+),\s*(\d+)\s*\)", body):
            rec[gm.group(1).replace(".", "_")] = int(gm.group(2))
        asset = re.search(r'load\("(?:\./)?tests/assets/([\w.]+)"\)', body)
        if asset:
            rec["asset"] = asset.group(1)
        if rec:
            out[name] = rec
    for name, rec in out.items():
        with open(os.path.join(OUT, f"basic_{name}.json"), "w") as f:
            json.dump(rec, f)
    print(f"wrote {len(out)} basic goldens")


def main():
    os.makedirs(OUT, exist_ok=True)
    src = open(REF).read()
    count = 0
    for name, body in split_tests(src):
        rec = {}
        asset = re.search(r'load\("\./tests/assets/([\w.]+)"\)', body)
        if asset:
            rec["asset"] = asset.group(1)
        dense = parse_dense(body, "[a-z_]+")
        # dense input matrix: first 2-D literal in the body, if any
        m2d = re.search(
            r"let\s+(?:mut\s+)?(\w+)\s*=\s*vec!\[\s*(?://[^\n]*\s*)?vec!", body
        )
        if m2d:
            rec["dense"] = parse_dense(body, m2d.group(1))
        for var, key in (("b", "b"), ("x", "x"), ("b_chol", "b"), ("b_static", "b")):
            v = parse_vec(body, var)
            if v is not None and key not in rec:
                rec[key] = v
        call = re.search(r"rsparse::(\w+)\(([^;]*)\)", body)
        if call:
            rec["solver"] = call.group(1)
            args = call.group(2)
            order = re.search(r",\s*(-?\d+)\s*(?:,|\))", args + ")")
            if order:
                rec["order"] = int(order.group(1))
            tolm = re.search(r",\s*(-?[\d.eE+-]+)\s*\)\s*$", args + ")")
            if tolm and rec["solver"] == "lusol":
                rec["lu_tol"] = float(tolm.group(1))
        tol = re.findall(r"assert_eq_f_vec\(&\w+,\s*&\w+,\s*([\d.eE+-]+)\)", body)
        if tol:
            rec["tol"] = float(tol[-1])
        rec["should_panic"] = "#[should_panic]" in src[: src.find(f"fn {name}")][-100:]
        with open(os.path.join(OUT, f"{name}.json"), "w") as f:
            json.dump(rec, f)
        count += 1
    print(f"wrote {count} goldens to {OUT}")


if __name__ == "__main__":
    main()
    extract_basic()
