"""Sweep the reference's dfs/**/*.dfs corpus through the DFS parser:
the honest front-end coverage metric. Parse-only gate (template vars
substituted with a placeholder), plus a node-name inventory showing
which nodes the compiler supports vs parse-only.

Run: python tools/dfs_sweep.py  -> prints a report; exit 1 if parse
coverage < 80%.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from faxe_spark.dfs import DFSCompiler, parse_script, substitute_template  # noqa: E402

REFERENCE = Path("/root/reference")


def compiled_node_names() -> set[str]:
    names = {m[len("node_"):] for m in dir(DFSCompiler) if m.startswith("node_")}
    names |= set(DFSCompiler.STAT_NODES)
    return names


def sweep(corpus_root: Path = REFERENCE):
    files = sorted(corpus_root.rglob("*.dfs"))
    ok, failed = [], []
    node_names: dict[str, int] = {}
    for f in files:
        text = f.read_text(errors="replace")
        try:
            text = substitute_template(text, {}, on_missing="1")
            chains = parse_script(text)
            for ch in chains:
                for n in ch.nodes:
                    node_names[n.name] = node_names.get(n.name, 0) + 1
            ok.append(f)
        except Exception as e:  # noqa: BLE001 - report, don't die
            failed.append((f, f"{type(e).__name__}: {e}"))
    return files, ok, failed, node_names


def compile_sweep(spark, corpus_root: Path = REFERENCE):
    """End-to-end COMPILE gate for the emitter-driven subset (scripts
    whose sources are json_emitter/value_emitter — the ones that can
    run without a broker/PLC in this container)."""
    from faxe_spark.dfs import DFSCompiler

    ok, failed = [], []
    for f in sorted(corpus_root.rglob("*.dfs")):
        text = substitute_template(f.read_text(errors="replace"), {},
                                   on_missing="1")
        try:
            chains = parse_script(text)
            heads = [c.nodes[0].name for c in chains if c.nodes]
            if not any(h in ("json_emitter", "value_emitter") for h in heads):
                continue
            c = DFSCompiler(spark)
            df = c.run(text)
            _ = df.schema
            ok.append(f)
        except Exception as e:  # noqa: BLE001 - report, don't die
            failed.append((f, f"{type(e).__name__}: {str(e)[:80]}"))
    return ok, failed


def exec_sweep(spark, corpus_root: Path = REFERENCE, limit: int = 50):
    """EXECUTION gate: every emitter-driven script that compiles must
    also RUN (`.limit(n).collect()`), catching runtime-only failures
    (Arrow transfer, python nodes, cast conflicts) the analyzer can't.
    Streaming-source scripts (http_get pollers etc.) count as ok at the
    analysis stage — a batch collect is impossible by design."""
    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.functions.lambda_lib import clear_mem

    ok, fail = [], []
    for f in sorted(corpus_root.rglob("*.dfs")):
        text = substitute_template(f.read_text(errors="replace"), {},
                                   on_missing="1")
        try:
            chains = parse_script(text)
            heads = [c.nodes[0].name for c in chains if c.nodes]
            if not any(h in ("json_emitter", "value_emitter") for h in heads):
                continue
            clear_mem()
            df = DFSCompiler(spark).run(text)
            if not df.isStreaming:
                df.limit(limit).collect()
            ok.append(f)
        except Exception as e:  # noqa: BLE001 - report, don't die
            fail.append((f, f"{type(e).__name__}: {str(e)[:100]}"))
    return ok, fail


def main() -> int:
    files, ok, failed, node_names = sweep()
    pct = 100.0 * len(ok) / max(len(files), 1)
    supported = compiled_node_names()
    # corpus-declared macros (||name() subgraphs) compile via
    # DFSCompiler._apply_macro — count them as supported
    macro_names = set()
    for f in files:
        for line in f.read_text(errors="replace").splitlines():
            m = DFSCompiler._MACRO_DECL.match(line)
            if m:
                macro_names.add(m.group(1))
    supported |= macro_names
    used = sorted(node_names)
    sup = [n for n in used if n.lstrip("@") in supported or n.startswith("@")]
    unsup = [n for n in used if n.lstrip("@") not in supported and not n.startswith("@")]

    print(f"DFS corpus sweep: {len(ok)}/{len(files)} files parse ({pct:.1f}%)")
    print(f"node names used: {len(used)}; compiled: {len(sup)}; "
          f"parse-only: {len(unsup)}")
    print("\nparse-only nodes (no compiler yet): "
          + ", ".join(f"{n}({node_names[n]})" for n in unsup))
    if failed:
        print("\nfailing files:")
        for f, err in failed:
            print(f"  {f.relative_to(REFERENCE)}: {err[:120]}")

    from faxe_spark.session import get_spark

    cok, cfail = compile_sweep(get_spark("dfs-sweep"))
    print(f"\ncompile sweep (emitter-driven subset): "
          f"{len(cok)}/{len(cok) + len(cfail)} compile end-to-end")
    for f, err in cfail:
        print(f"  {f.relative_to(REFERENCE)}: {err[:110]}")
    return 0 if pct >= 80.0 else 1


if __name__ == "__main__":
    sys.exit(main())
