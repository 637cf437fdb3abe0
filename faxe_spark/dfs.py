"""DFS text front-end: parse the reference's dataflow script language
and compile a supported subset onto the operator library.

Grammar (observed from the reference's dfs/ corpus and the golden
graph-compilation tests, apps/faxe/test/dfs_to_graph.erl):

    script  := stmt*
    stmt    := 'def' IDENT '=' chain | chain
    chain   := [IDENT] ('|' node)('.' param)*...
    node    := IDENT '(' args? ')'
    param   := IDENT '(' args? ')'
    args    := arg (',' arg)*
    arg     := 'string' | <<<heredoc>>> | number | duration | true/false
               | lambda: <expr> | IDENT (variable/macro reference)

Comments: '%' to end of line. Lambdas: double-quoted = field path,
single-quoted = string literal, names resolve through the lambda
library (faxe_spark.functions.lambda_lib).

This is a from-scratch parser (the reference's `dfs` parser is an
external Erlang dep); the compile target is DataFrames, not an actor
graph — `def` variables become named DataFrames, fan-in (join/union)
consumes them, group_by becomes group keys on downstream operators.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from faxe_spark.durations import parse_duration_ms
from faxe_spark.functions.lambda_lib import LAMBDA_FUNCTIONS, truthy
from faxe_spark import operators as ops

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<heredoc><<<.*?>>>)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<lambda>lambda:|e:)
  | (?P<duration>-?\d+(?:ms|s|m|h|d|w)\b)
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)
  | (?P<ident>@?[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op>\|\||[|.(),=])
""", re.X | re.S)


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


def _strip_comments(text: str) -> str:
    out = []
    in_sq = False
    in_heredoc = False
    i = 0
    while i < len(text):
        if in_heredoc:
            if text.startswith(">>>", i):
                in_heredoc = False
                out.append(">>>")
                i += 3
                continue
            out.append(text[i]); i += 1
            continue
        if in_sq:
            if text[i] == "'":
                in_sq = False
            out.append(text[i]); i += 1
            continue
        if text.startswith("<<<", i):
            in_heredoc = True
            out.append("<<<"); i += 3
            continue
        if text[i] == "'":
            in_sq = True
            out.append(text[i]); i += 1
            continue
        if text[i] == "%":
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        out.append(text[i]); i += 1
    return "".join(out)


def tokenize(text: str) -> list[Tok]:
    text = _strip_comments(text)
    toks: list[Tok] = []
    i = 0
    while i < len(text):
        if text[i].isspace():
            i += 1
            continue
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"DFS syntax error at: {text[i:i + 40]!r}")
        kind = m.lastgroup or "?"
        if kind == "lambda":
            # capture the lambda body up to the ',' or ')' that closes the
            # enclosing argument (lambda bodies may contain parens)
            depth = 0
            j = m.end()
            while j < len(text):
                c = text[j]
                if c == "'":  # skip string literal
                    j = text.index("'", j + 1) + 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif c == "," and depth == 0:
                    break
                j += 1
            toks.append(Tok("lambda", text[m.end():j].strip(), i))
            i = j
            continue
        toks.append(Tok(kind, m.group(), i))
        i = m.end()
    return toks


# ---------------------------------------------------------------------------
# Parser -> IR (the analog of faxe_dfs IR#1, dfs_to_graph.erl goldens)
# ---------------------------------------------------------------------------

@dataclass
class NodeCall:
    name: str
    args: list
    params: dict[str, list] = field(default_factory=dict)


@dataclass
class Chain:
    var: str | None          # 'def <var> =' target
    source_ref: str | None   # leading variable reference
    nodes: list[NodeCall] = field(default_factory=list)
    const: object = None     # 'def var = <literal>' constant definition
    is_const: bool = False


@dataclass
class Lambda:
    body: str


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, k=0) -> Tok | None:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise ValueError(f"DFS parse error: expected {text!r}, got {t.text!r}")
        return t

    def parse(self) -> list[Chain]:
        chains = []
        while self.peek() is not None:
            before = self.i
            chains.append(self.chain())
            if self.i == before:
                t = self.peek()
                raise ValueError(f"DFS parse error: unexpected token {t.text!r} "
                                 f"at top level (pos {t.pos})")
        return chains

    def chain(self) -> Chain:
        var = None
        src = None
        t = self.peek()
        if t.kind == "ident" and t.text in ("def", "var"):
            self.next()
            var = self.next().text
            self.expect("=")
            t = self.peek()
            # constant definition: def name = <literal>  (dfs template vars)
            if t is not None and t.kind in ("string", "heredoc", "number",
                                            "duration", "lambda"):
                return Chain(var, None, [], const=self.arg(), is_const=True)
        if t is not None and t.kind == "ident" and not t.text.startswith("@"):
            src = self.next().text
        nodes = []
        while (p := self.peek()) is not None and (
                p.text in ("|", "||")
                or (p.kind == "ident" and p.text.startswith("@"))):
            if p.text in ("|", "||"):  # '||' = macro invocation edge
                self.next()
            nodes.append(self.node_call())
        return Chain(var, src, nodes)

    def node_call(self) -> NodeCall:
        name = self.next().text
        args = self.arglist() if (p := self.peek()) and p.text == "(" else []
        node = NodeCall(name, args)
        while (p := self.peek()) is not None and p.text == ".":
            self.next()
            pname = self.next().text
            pargs = self.arglist() if (q := self.peek()) and q.text == "(" else []
            node.params[pname] = pargs
        return node

    def arglist(self) -> list:
        self.expect("(")
        args = []
        while (p := self.peek()) is not None and p.text != ")":
            args.append(self.arg())
            if (q := self.peek()) is not None and q.text == ",":
                self.next()
        self.expect(")")
        return args

    def arg(self):
        t = self.next()
        if t.kind == "string":
            return t.text[1:-1]
        if t.kind == "heredoc":
            return t.text[3:-3]
        if t.kind == "duration":
            return ("duration", t.text)
        if t.kind == "number":
            return float(t.text) if "." in t.text or "e" in t.text.lower() else int(t.text)
        if t.kind == "lambda":
            return Lambda(t.text)
        if t.kind == "ident":
            if t.text == "true":
                return True
            if t.text == "false":
                return False
            if (p := self.peek()) is not None and p.text == "(":
                # bare function-call expression arg (lambda without prefix,
                # seen in the corpus e.g. array_explode.dfs eval args)
                return Lambda(t.text + self._balanced_text())
            return ("ref", t.text)
        raise ValueError(f"DFS parse error: unexpected arg {t.text!r}")

    def _balanced_text(self) -> str:
        """Consume a balanced-paren token run, reconstructing source text
        (used to re-materialize a bare call expression as a lambda body)."""
        parts: list[str] = []
        depth = 0
        while True:
            t = self.next()
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            if parts and t.text not in "()," and parts[-1] not in "(,":
                parts.append(" ")
            parts.append(t.text)
            if depth == 0:
                return "".join(parts)


_TEMPLATE_RE = re.compile(r'\{\{\s*"?([A-Za-z_][\w\-.]*)"?\s*\}\}')


def substitute_template(text: str, vars: dict | None = None, *,
                        on_missing: str = "error") -> str:
    """`{{var}}` template substitution (faxe_dfs.erl:49-57: vars are
    passed to dfs:parse and spliced before parsing; faxe.hrl template
    records). Quoted form `{{"name"}}` is accepted. on_missing:
    'error' raises with the full missing-var list; any other string is
    used as the fallback value (the parse-only corpus sweep uses '1')."""
    vars = vars or {}
    missing = []

    def sub(m):
        name = m.group(1)
        if name in vars:
            return str(vars[name])
        if on_missing == "error":
            missing.append(name)
            return ""
        return on_missing

    out = _TEMPLATE_RE.sub(sub, text)
    if missing:
        raise KeyError(f"dfs template vars not provided: {sorted(set(missing))}")
    return out


def parse_script(text: str, vars: dict | None = None, *,
                 on_missing: str = "error") -> list[Chain]:
    """Parse a DFS script. Template vars are STRICT by default — an
    unbound {{var}} raises, matching the reference's template handling.
    The parse-only sweep (tools/dfs_sweep.py) passes on_missing='1' to
    tolerate unbound slots when it only checks syntax."""
    if _TEMPLATE_RE.search(text):
        text = substitute_template(text, vars or {}, on_missing=on_missing)
    return _Parser(tokenize(text)).parse()


# ---------------------------------------------------------------------------
# Lambda expression compiler
# ---------------------------------------------------------------------------

_LAMBDA_TOKEN = re.compile(r"""
    (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<fieldref>"[^"]+")
  | (?P<duration>-?\d+(?:ms|s|m|h|d|w)\b)
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op><=|>=|==|!=|=<|\*|\+|-|/|%|<|>|\(|\),?|,|\[|\])
""", re.X)


class _LambdaParser:
    """Recursive-descent for the DFS lambda expression subset:
    field refs, literals, lambda-lib calls, arithmetic/comparison,
    AND/OR/NOT (Erlang-style keywords, case-insensitive)."""

    def __init__(self, body: str, consts: dict | None = None,
                 fieldref=None, funcs: dict | None = None):
        self.consts = consts or {}
        self.fieldref = fieldref  # schema-aware resolver (undefined -> NULL)
        self.funcs = funcs if funcs is not None else LAMBDA_FUNCTIONS
        self.toks = []
        i = 0
        while i < len(body):
            if body[i].isspace():
                i += 1
                continue
            m = _LAMBDA_TOKEN.match(body, i)
            if not m:
                raise ValueError(f"lambda syntax error at: {body[i:i+30]!r}")
            kind = m.lastgroup
            text = m.group()
            if kind == "op" and len(text) == 2 and text == "),":  # '),' split
                self.toks.append(("op", ")"))
                self.toks.append(("op", ","))
            else:
                self.toks.append((kind, text))
            i = m.end()
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Column:
        e = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"lambda: trailing tokens {self.toks[self.i:]}")
        return e

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self.peek() == ("name", "OR") or self.peek() == ("name", "or"):
            self.next()
            left = truthy(left) | truthy(self.and_expr())
        return left

    def and_expr(self) -> Column:
        left = self.cmp_expr()
        while self.peek() == ("name", "AND") or self.peek() == ("name", "and"):
            self.next()
            left = truthy(left) & truthy(self.cmp_expr())
        return left

    def cmp_expr(self) -> Column:
        left = self.add_expr()
        kind, text = self.peek()
        if kind == "op" and text in ("<", ">", "<=", ">=", "==", "!=", "=<"):
            self.next()
            right = self.add_expr()
            return {"<": left < right, ">": left > right, "<=": left <= right,
                    "=<": left <= right, ">=": left >= right,
                    "==": left == right, "!=": left != right}[text]
        return left

    def add_expr(self) -> Column:
        left = self.mul_expr()
        while True:
            kind, text = self.peek()
            if kind == "op" and text in ("+", "-"):
                self.next()
                right = self.mul_expr()
                left = left + right if text == "+" else left - right
            else:
                return left

    def mul_expr(self) -> Column:
        left = self.unary()
        while True:
            kind, text = self.peek()
            if kind == "op" and text in ("*", "/", "%"):
                self.next()
                right = self.unary()
                left = {"*": left * right, "/": left / right, "%": left % right}[text]
            else:
                return left

    def unary(self) -> Column:
        kind, text = self.peek()
        if kind == "name" and text in ("NOT", "not"):
            self.next()
            return ~truthy(self.unary())
        return self.atom()

    def atom(self) -> Column:
        kind, text = self.next()
        if kind == "string":
            return F.lit(text[1:-1])
        if kind == "fieldref":
            from faxe_spark.paths import get_path
            if self.fieldref is not None:
                return self.fieldref(text[1:-1])
            return get_path(text[1:-1])
        if kind == "number":
            return F.lit(float(text) if "." in text else int(text))
        if kind == "duration":
            return F.lit(parse_duration_ms(text))  # faxe_time unit literal
        if kind == "op" and text == "[":
            # list literal (str_concat(['a', "f", ...]) in the corpus)
            items = []
            while self.peek() != ("op", "]"):
                items.append(self.or_expr())
                if self.peek() == ("op", ","):
                    self.next()
            self.next()
            return items
        if kind == "op" and text == "(":
            e = self.or_expr()
            k, t = self.next()
            if t != ")":
                raise ValueError("lambda: unbalanced parens")
            return e
        if kind == "name":
            if text == "undefined" and self.peek() != ("op", "("):
                # bare `undefined` = null literal; `undefined(x)` is the
                # is-undefined predicate and falls through to the
                # function-call path (dfs_std_lib:undefined/1)
                return F.lit(None)
            nk, nt = self.peek()
            if nk == "op" and nt == "(":
                self.next()
                args = []
                while self.peek() != ("op", ")"):
                    # a bare literal arg passes through as a Python value:
                    # functions evaluated at compile time (env, mem,
                    # round_float digits, map keys) need raw literals; the
                    # library re-wraps Column-taking args via _c()
                    ak, at = self.peek()
                    nxt = self.toks[self.i + 1][1] if self.i + 1 < len(self.toks) else None
                    if ak == "string" and nxt in (",", ")"):
                        self.next()
                        args.append(at[1:-1])
                    elif ak == "number" and nxt in (",", ")"):
                        self.next()
                        args.append(float(at) if "." in at else int(at))
                    elif (ak == "name" and nxt in (",", ")")
                          and at in self.consts
                          and not isinstance(self.consts[at], Lambda)):
                        # const ref as bare arg: pass the RAW value, so
                        # literal-taking functions (map_get's JSON-string
                        # map, mem keys) see the Python literal
                        self.next()
                        args.append(self.consts[at])
                    else:
                        args.append(self.or_expr())
                    if self.peek() == ("op", ","):
                        self.next()
                self.next()
                fn = self.funcs.get(text)
                if fn is None:
                    raise ValueError(f"unknown lambda function {text!r} "
                                     f"(lambda library, SURVEY §2.11)")
                return fn(*args)
            if text in self.consts:
                v = self.consts[text]
                if isinstance(v, Lambda):
                    return _LambdaParser(v.body, self.consts, self.fieldref,
                                         self.funcs).parse()
                return F.lit(v)
            # bare name = field reference (unquoted single-segment path)
            return F.col(text)
        raise ValueError(f"lambda: unexpected token {text!r}")


def compile_lambda(body: str, consts: dict | None = None,
                   fieldref=None, funcs: dict | None = None) -> Column:
    return _LambdaParser(body, consts, fieldref, funcs).parse()


# ---------------------------------------------------------------------------
# Graph compiler: chains -> DataFrames
# ---------------------------------------------------------------------------

def _dur_str(v) -> str:
    if isinstance(v, tuple) and v[0] == "duration":
        return v[1]
    raise ValueError(f"expected duration literal, got {v!r}")


class DFSCompiler:
    """Compiles the batch-expressible node subset onto the operator
    library. Unsupported nodes raise with the reference file they map to
    (so the gap is explicit, not silent)."""

    def __init__(self, spark: SparkSession, *, tables_dir: str | None = None,
                 sources: dict[str, DataFrame] | None = None,
                 python_nodes: dict | None = None, broker=None):
        self.spark = spark
        self.tables_dir = tables_dir
        self.broker = broker  # EmbeddedBroker for mqtt/amqp-node tests
        self.env: dict[str, DataFrame] = dict(sources or {})
        self.consts: dict[str, object] = {}
        self.group_keys: list[str] = []
        self.window = None            # pending time/session window Column
        self.count_window = None      # pending (period, every) count window
        self.sinks: list[dict] = []   # deferred sink specs (runner applies)
        self.listeners: list = []     # live edge listeners (udp) to stop()
        self.plc_plans: list = []     # coalesced PLC wire plans (s7/modbus)
        self.connector_specs: list = []  # DB connector specs (jdbc/mongo)
        self.macros: dict[str, str] = {}  # ||name() subgraph bodies
        self._current_df: DataFrame | None = None
        self._fill_period = False     # pending window's fill_period flag
        self._window_src: DataFrame | None = None  # df feeding the window
        # window specs keyed by the producing df's id: a windowed stream
        # fanned out to several aggregate chains (the corpus group_by.dfs
        # shape) re-applies the same window per consumer instead of only
        # the first one consuming the single pending slot
        self._df_windows: dict[int, tuple] = {}
        from faxe_spark.python_nodes import BUILTIN_PYTHON_NODES

        self.python_nodes = {**BUILTIN_PYTHON_NODES, **(python_nodes or {})}

    def run(self, script: str, vars: dict | None = None) -> DataFrame:
        # strict template substitution: a real compile of a
        # var-parameterized script must raise on unbound {{vars}} like
        # the reference, never proceed with a placeholder literal.
        script = self._extract_macros(script)
        chains = parse_script(script, vars)
        self._preregister_mem(chains)
        result = None
        for chain in chains:
            if chain.is_const:
                self.consts[chain.var] = chain.const
                continue
            df = self.env[chain.source_ref] if chain.source_ref else None
            for node in chain.nodes:
                df = self.apply(df, node)
            if chain.var:
                self.env[chain.var] = df
            result = df
        if result is None:
            raise ValueError("empty DFS script")
        return result

    # -- macros ------------------------------------------------------------
    # The reference stores reusable subgraphs ("macros") under a flow id
    # and splices them in where `||macro_name()` appears; node params
    # override the macro body's `def` defaults (dfs/other/macro1.dfs:
    # "%% macro : flow_id : ctc_module_condition"). The corpus convention
    # declares the macro body inline between that marker comment and the
    # "%% use" comment — extract it, register it, and strip it from the
    # main script so the body doesn't also compile as a free chain.

    _MACRO_DECL = re.compile(r"^\s*%+\s*macro\s*:\s*flow_id\s*:\s*(\S+)")
    # terminator must be the whole comment ('%% use'), so an ordinary
    # body comment like '% use upstream default' can't truncate a macro
    _MACRO_USE = re.compile(r"^\s*%+\s*use\s*$")

    def _extract_macros(self, script: str) -> str:
        if "macro" not in script:
            return script
        main_lines, body, name = [], [], None
        for line in script.splitlines():
            decl = self._MACRO_DECL.match(line)
            if name is None:
                if decl:
                    name = decl.group(1)
                    continue
                main_lines.append(line)
            else:
                if decl:  # back-to-back declarations, no '%% use'
                    self.macros[name] = "\n".join(body)
                    name, body = decl.group(1), []
                    continue
                if self._MACRO_USE.match(line):
                    self.macros[name] = "\n".join(body)
                    name, body = None, []
                    continue
                body.append(line)
        if name is not None:  # macro runs to EOF
            self.macros[name] = "\n".join(body)
        return "\n".join(main_lines)

    def _apply_macro(self, df: DataFrame, node: NodeCall) -> DataFrame:
        chains = parse_script(self.macros[node.name])
        saved = dict(self.consts)
        try:
            for ch in chains:
                if ch.is_const:
                    self.consts[ch.var] = ch.const
            # invocation params override the body's def defaults
            for k, vals in node.params.items():
                self.consts[k] = self._val(vals[0])
            for ch in chains:
                if ch.is_const:
                    continue
                for n in ch.nodes:
                    df = self.apply(df, n)
        finally:
            self.consts = saved
        return df

    def _preregister_mem(self, chains) -> None:
        """Flow-wide memory (esp_mem.erl:31) is readable from ANY lambda
        regardless of where the mem node sits in the script — register
        every mem key (with its default or a typed empty) up front so
        earlier chains compile against it.

        Keys the script DECLARES (via its own mem nodes) are overwritten
        — a flow's startup default beats stale state a previously
        compiled script left in the process-global store (the reference
        mem node initializes its key at flow startup, esp_mem.erl:45).
        Keys the script only READS (mem()/ls_mem lambdas, no mem node)
        keep externally provided set_mem values."""
        from faxe_spark.functions.lambda_lib import set_mem

        # consts first: mem keys are usually `def`-const references
        for chain in chains:
            if chain.is_const:
                self.consts[chain.var] = chain.const
        for chain in chains:
            for node in chain.nodes:
                if node.name != "mem":
                    continue
                key = node.params.get("key", node.args or [None])[0]
                if key is None:
                    key = node.params.get("field", [None])[0]
                key = self._val(key)
                if key is None:
                    continue
                default = self._val(node.params.get("default", [None])[0])
                mtype = str(node.params.get("type", ["single"])[0])
                if default is None and mtype in ("list", "set"):
                    default = []
                set_mem(str(key), default)

    # -- helpers -----------------------------------------------------------
    def _fieldref(self, path: str) -> Column:
        """Schema-aware field resolution: a path the current schema
        can't satisfy reads as NULL — flowdata's `undefined`, not an
        analyzer error (get_path_safe). TimestampType values resolve to
        epoch-ms integers: the DFS lambda domain is faxe_time ms (the
        corpus does `"ts" - 60000`, `string("ts")`)."""
        from pyspark.sql.types import TimestampType
        from faxe_spark.paths import get_path, get_path_safe

        if self._current_df is None:
            return get_path(path)
        df = self._current_df
        col = get_path_safe(df, path)
        if path in df.columns and isinstance(
                df.schema[path].dataType, TimestampType):
            return F.unix_millis(col)
        return col

    _LAM_FUNCS = None  # cached overlay: LAMBDA_FUNCTIONS + ms-time variants

    def _lam_funcs(self) -> dict:
        if DFSCompiler._LAM_FUNCS is None:
            from faxe_spark.functions.lambda_lib import DFS_TIME_MS_OVERRIDES
            DFSCompiler._LAM_FUNCS = {**LAMBDA_FUNCTIONS, **DFS_TIME_MS_OVERRIDES}
        return DFSCompiler._LAM_FUNCS

    def _lam(self, x) -> Column:
        if isinstance(x, Lambda):
            return compile_lambda(x.body, self.consts, self._fieldref,
                                  self._lam_funcs())
        if isinstance(x, tuple) and x[0] == "ref":
            v = self.consts[x[1]]
            return compile_lambda(v.body, self.consts, self._fieldref,
                                  self._lam_funcs()) \
                if isinstance(v, Lambda) else F.lit(v)
        return F.lit(x)

    def _val(self, x):
        """Resolve a plain arg: const refs to their value, else as-is."""
        if isinstance(x, tuple) and x[0] == "ref":
            return self.consts[x[1]]
        return x

    def _dur(self, x) -> str:
        """Duration literal, resolving `def`-const references first
        (dfs scripts routinely write .every(emit_every))."""
        return _dur_str(self._val(x))

    def _restore_window(self, df: DataFrame | None) -> None:
        """Re-arm the pending window from the per-df registry (window
        fan-out: several aggregates over one windowed stream)."""
        if self.window is None and df is not None \
                and id(df) in self._df_windows:
            self.window, self._fill_period, self._window_src = \
                self._df_windows[id(df)]

    def _agg_keys(self) -> list:
        keys = ([self.window] if self.window is not None else []) + self.group_keys
        self._had_window = self.window is not None
        self.window = None
        return keys

    def _post_agg(self, out: DataFrame) -> DataFrame:
        """fill_period suppression (esp_win_clock.erl:10): drop partial
        head windows once the windowed aggregate is formed; windowed
        aggregate points get ts = window start (esp_aggregate.erl:96-100
        batch.start semantics) so downstream ts-keyed nodes (join) work."""
        if self._fill_period and getattr(self, "_had_window", False) \
                and self._window_src is not None and "window" in out.columns:
            out = ops.fill_period_filter(out, self._window_src)
        self._fill_period = False
        self._window_src = None
        for wcol in ("window", "session"):
            if wcol in out.columns and "ts" not in out.columns:
                out = out.withColumn("ts", F.col(f"{wcol}.start"))
        return out

    def _stat(self, df: DataFrame, func: str, node: NodeCall) -> DataFrame:
        """Single-field stat node (§2.6 stats family): aggregates the
        pending window/batch group, like the esp_stats dispatcher."""
        self._restore_window(df)
        field = node.args[0] if node.args else node.params.get("field", ["value"])[0]
        alias = node.params.get("as", [f"{field}_{func}"])[0]
        df, (field,) = self._materialize_paths(df, [field])
        if self.count_window is not None:
            period, every = self.count_window
            fill = self._fill_period
            self._fill_period = False
            self.count_window = None
            return ops.win_event_agg(df, [(field, func, alias)], period, every,
                                     by=self.group_keys, fill_period=fill)
        return self._post_agg(
            ops.aggregate(df, [(field, func, alias)], by=self._agg_keys()))

    # -- node dispatch -----------------------------------------------------
    STAT_NODES = ("avg", "sum", "count", "count_distinct", "mean", "median",
                  "min", "max", "stddev", "variance", "skew", "kurtosis",
                  "geometric_mean", "range", "first", "last")

    _SOURCE_NODES = ("json_emitter", "value_emitter", "parquet", "http_get",
                     "tcp_recv", "tcp_recv_line", "tcppoll", "udp_recv",
                     "http_listen", "crate_query", "crate_query_cont",
                     "postgre_statement",
                     "mongo_query", "oracle_query", "blobstream",
                     "postgresql_query", "modbus", "modbus_multi", "s7read",
                     "conn_status")

    def apply(self, df: DataFrame | None, node: NodeCall) -> DataFrame:
        if node.name in self.macros:
            return self._apply_macro(df, node)
        if df is None and node.name not in self._SOURCE_NODES \
                and not node.name.startswith("@"):
            # a transform chain with no upstream source (corpus scripts
            # ship dangling `def x = |where(...)` chains): the node sits
            # idle in the reference; the analog is an empty typed input
            df = self.spark.range(0).select(
                F.lit(None).cast("timestamp").alias("ts"))
        fn = getattr(self, f"node_{node.name}", None)
        if fn is None:
            if node.name in self.STAT_NODES:
                return self._stat(df, node.name, node)
            if node.name.startswith("@"):
                return self._apply_python_node(df, node)
            raise NotImplementedError(
                f"DFS node '{node.name}' not yet mapped (see SURVEY.md §2)")
        # faxe reads of absent fields yield `undefined` (flowdata:field ->
        # undefined, dfs_std_lib truthiness treats it falsy). Spark's
        # analyzer instead rejects the plan — so when a node references a
        # column the current schema lacks, materialize it as NULL and
        # retry: same observable semantics, bounded by the reference count.
        from pyspark.errors.exceptions.captured import AnalysisException

        for _ in range(8):
            # node compilers consume builder state (_agg_keys clears the
            # pending window, _stat resets count_window/_fill_period) —
            # snapshot it so a failed attempt can retry with identical
            # state instead of silently compiling un-windowed.
            snap = (self.window, self.count_window, self._fill_period,
                    self._window_src, list(self.group_keys))
            try:
                self._current_df = df
                return fn(df, node)
            except AnalysisException as e:
                (self.window, self.count_window, self._fill_period,
                 self._window_src, self.group_keys) = snap
                m = re.search(r"UNRESOLVED_COLUMN[^`]*`([^`]+)`", str(e))
                if m is None or df is None or m.group(1) in df.columns:
                    raise
                df = df.withColumn(m.group(1), F.lit(None))
        return fn(df, node)

    @staticmethod
    def _widen_numbers(rows: list) -> list:
        """JSON rows mixing ints and floats under one key (jiffy decodes
        each literally) break schema inference — widen such keys to
        float, recursively through nested objects."""
        def scan(objs):
            keys = {k for o in objs if isinstance(o, dict) for k in o}
            for k in keys:
                vals = [o[k] for o in objs
                        if isinstance(o, dict) and o.get(k) is not None]
                if not vals:  # all-null key: unrepresentable -> undefined
                    for o in objs:
                        if isinstance(o, dict):
                            o.pop(k, None)
                    continue
                if any(isinstance(v, float) for v in vals) and any(
                        type(v) is int for v in vals):
                    for o in objs:
                        if isinstance(o, dict) and type(o.get(k)) is int:
                            o[k] = float(o[k])
                    vals = [o[k] for o in objs
                            if isinstance(o, dict) and o.get(k) is not None]
                # heterogeneous lists (ints mixed with objects) cannot be
                # typed: carry them as their JSON text (opaque payload)
                for v in vals:
                    if isinstance(v, list) and len({type(e) for e in v}) > 1:
                        for o in objs:
                            if isinstance(o, dict) and isinstance(o.get(k), list):
                                o[k] = json.dumps(o[k])
                        vals = []
                        break
                nested = [v for v in vals if isinstance(v, dict)]
                if nested:
                    scan(nested)
        scan(rows)
        return rows

    def _apply_python_node(self, df, node: NodeCall) -> DataFrame:
        """`@Class()` user-callback nodes (c_python3.erl) through the
        mapInPandas adapter; the class comes from the python_nodes
        registry (built-in examples + user-registered)."""
        from pyspark.sql.types import (DoubleType, LongType, StringType,
                                       StructField, StructType)

        from faxe_spark.udf import apply_node

        cls = self.python_nodes.get(node.name[1:])
        if cls is None:
            raise NotImplementedError(
                f"DFS python node '{node.name}': register the class via "
                f"DFSCompiler(python_nodes=...) — faxe_spark.udf adapter, "
                f"c_python3.erl parity")
        opts = {k: self._val(v[0]) for k, v in node.params.items() if v}
        opts.update({k: True for k, v in node.params.items() if not v})
        # c_python3 delivers only DECLARED options to init (faxe.py
        # options contract); undeclared extras in scripts are dropped
        declared = {name for name, _d in cls.options()}
        opts = {k: v for k, v in opts.items() if k in declared}
        if "field" in opts and df is not None:
            df, (flat,) = self._materialize_paths(df, [str(opts["field"])])
            opts["field"] = flat
            self._current_df = df
        tmap = {"double": DoubleType(), "long": LongType(),
                "string": StringType()}
        added = [StructField(n, tmap[t]) for n, t in cls.added_fields(opts)]
        schema = StructType(list(df.schema.fields) + added)
        return apply_node(df, cls, schema, **opts)

    def node_json_emitter(self, df, node: NodeCall) -> DataFrame:
        rows = [json.loads(a) for a in node.args if isinstance(a, str)]
        rows += [json.loads(a) for a in node.params.get("json", []) if isinstance(a, str)]
        every_ms = parse_duration_ms(self._dur(node.params["every"][0])) \
            if "every" in node.params else 1000
        base = 1_700_000_000_000  # deterministic synthetic epoch base
        out = []
        for i, r in enumerate(rows):
            out.append({"ts": base + i * every_ms, **r})
        if not out:  # emitter with no literal rows: one ts-only tick
            out = [{"ts": base}]
        # `.as(root)` nests the payload under a root field
        # (esp_json_emitter.erl:199-201 flowdata:set_root) — scripts then
        # address fields as "root.x.y".
        root = node.params.get("as", [None])[0]
        if root:
            out = [{"ts": r.pop("ts"), str(root): r} for r in out]
        # schema via Spark's JSON inference (jiffy-equivalent): object
        # schemas union into nullable structs, ints/floats widen, and
        # irreconcilable arrays fall back to strings — createDataFrame's
        # dict inference can't merge heterogeneous nested shapes.
        lines = [json.dumps(o) for o in out]
        pdf = self.spark.read.json(
            self.spark.sparkContext.parallelize(lines, 1))
        return pdf.withColumn("ts", F.timestamp_millis(F.col("ts")))

    def node_parquet(self, df, node: NodeCall) -> DataFrame:
        from faxe_spark.tables import load_table
        return load_table(self.spark, self.tables_dir, node.args[0])

    def node_where(self, df, node: NodeCall) -> DataFrame:
        src = node.args[0] if node.args else node.params["lambda"][0]
        return ops.where(df, truthy(self._lam(src)))

    def node_eval(self, df, node: NodeCall) -> DataFrame:
        aliases = [str(self._val(a)) for a in node.params.get("as", [])]
        lams = node.args or node.params.get("lambdas", [])
        exprs = {}
        for lam, alias in zip(lams, aliases):
            exprs[alias] = self._lam(lam)
        return ops.eval_lambdas(df, exprs)

    def node_set(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", [])
        values = [self._val(v) for v in node.params.get("field_values", [])]
        return ops.set_fields(df, dict(zip(fields_, values)))

    def node_default(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", [])
        values = [self._val(v) for v in node.params.get("field_values", [])]
        return ops.default_fields(df, dict(zip(fields_, values)))

    def _materialize_paths(self, df, fields):
        """Nested/dotted path args become flat null-safe columns
        (flowdata undefined semantics) so downstream ops that expect
        plain column names work over any payload schema."""
        names = []
        for pth in fields:
            if pth in df.columns and "." not in pth and "[" not in pth:
                names.append(pth)
                continue
            # dotted paths — nested OR literally-dotted flat columns —
            # copy to a flat name (exact-name-first via get_path_safe)
            flat = pth.replace(".", "_").replace("[", "_").replace("]", "")
            df = df.withColumn(flat, self._fieldref(pth))
            names.append(flat)
        self._current_df = df
        return df, names

    def node_keep(self, df, node: NodeCall) -> DataFrame:
        fields_ = list(node.args) + list(node.params.get("fields", []))
        aliases = node.params.get("as", None)
        df, names = self._materialize_paths(df, fields_)
        # default output names = the ORIGINAL paths (flat-materialized
        # columns would otherwise leak their underscore names)
        return ops.keep(df, names, aliases or fields_)

    def node_delete(self, df, node: NodeCall) -> DataFrame:
        return ops.delete(df, list(node.args) + list(node.params.get("fields", [])))

    def node_rename(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", [])
        as_ = node.params.get("as_fields", node.params.get("as", []))
        return ops.rename(df, dict(zip(fields_, as_)))

    def node_group_by(self, df, node: NodeCall) -> DataFrame:
        keys = [a for a in node.args if isinstance(a, str)]
        if df is not None:
            df, keys = self._materialize_paths(df, keys)
        self.group_keys = keys
        return df

    def node_group_union(self, df, node: NodeCall) -> DataFrame:
        self.group_keys = []
        return df

    def node_win_time(self, df, node: NodeCall) -> DataFrame:
        every = self._dur(node.params["every"][0]) if "every" in node.params else None
        period = self._dur(node.params["period"][0]) if "period" in node.params \
            else every  # reference: period defaults to the emit interval
        if period is None:
            raise ValueError("win_time needs .period() or .every()")
        self.window = ops.win_time("ts", period, every).alias("window")
        self._fill_period = "fill_period" in node.params
        self._window_src = df
        self._df_windows[id(df)] = (self.window, self._fill_period, df)
        return df

    def node_win_session(self, df, node: NodeCall) -> DataFrame:
        self.window = ops.win_session(
            "ts", self._dur(node.params["session_timeout"][0])).alias("session")
        self._df_windows[id(df)] = (self.window, False, df)
        return df

    def node_aggregate(self, df, node: NodeCall) -> DataFrame:
        self._restore_window(df)
        fields_ = node.params.get("fields", [])
        df, fields_ = self._materialize_paths(df, fields_)
        funcs = node.params.get("functions", [])
        aliases = node.params.get("as", [f"{f}_{fn}" for f, fn in zip(fields_, funcs)])
        specs = list(zip(fields_, funcs, aliases))
        if self.count_window is not None:
            period, every = self.count_window
            fill = self._fill_period
            self._fill_period = False
            self.count_window = None
            return ops.win_event_agg(df, specs, period, every,
                                     by=self.group_keys, fill_period=fill)
        return self._post_agg(ops.aggregate(df, specs, by=self._agg_keys()))

    def node_value_diff(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", [])
        mode = node.params.get("mode", ["c-p"])[0]
        df, names = self._materialize_paths(df, fields_)
        return ops.value_diff(df, names, mode=mode, by=self.group_keys)

    def node_sample(self, df, node: NodeCall) -> DataFrame:
        rate = node.args[0] if node.args else node.params.get("rate", [10])[0]
        if isinstance(rate, tuple):
            return ops.sample_per(df, rate[1], by=self.group_keys)
        return ops.sample_nth(df, int(rate), by=self.group_keys)

    def node_union(self, df, node: NodeCall) -> DataFrame:
        others = [self.env[a[1]] for a in node.args if isinstance(a, tuple) and a[0] == "ref"]
        return ops.union_streams(df, *others)

    def node_join(self, df, node: NodeCall) -> DataFrame:
        others = [self.env[a[1]] for a in node.args
                  if isinstance(a, tuple) and a[0] == "ref"]
        tol = self._dur(node.params["tolerance"][0]) if "tolerance" in node.params else None
        # keyless = the reference's default: streams align purely on
        # nearest-ts. The ordered window then has no partition key (one
        # task) — fine for the edge-node data rates this node mirrors;
        # large-scale keyed alignment passes group_by first.
        keys = self.group_keys or []
        if "merge_field" in node.params:  # esp_join.erl merge mode :205-216
            mf = node.params["merge_field"][0]
            # full=true (the reference DEFAULT, esp_join.erl:62) = emit
            # only complete rows -> inner; full=false = outer-with-fill
            # -> left join keeping partial rows.
            full = str(self._val(node.params.get("full", ["true"])[0])).lower()
            how = "inner" if full == "true" else "left"
            if all(mf in d.columns for d in [df, *others]):
                return ops.merge_join([df, *others], keys, ts_col="ts",
                                      merge_field=mf, direction="nearest",
                                      tolerance=tol, how=how)
            # merge root absent from a stream (e.g. upstream aggregates
            # flattened it away): degrade to prefix as-of alignment
            out = df
            for i, other in enumerate(others):
                out = ops.asof_join(out, other, keys, ts_col="ts",
                                    direction="nearest", tolerance=tol,
                                    right_prefix=f"r{i}_", how=how)
            return out
        # pad user-supplied prefixes so a short .prefix() list can't
        # silently truncate the join fan-in (zip would drop streams)
        prefixes = list(node.params.get("prefix", []))
        prefixes += [f"r{i}_" for i in range(len(prefixes), len(others))]
        full = str(self._val(node.params.get("full", ["true"])[0])).lower()
        how = "inner" if full == "true" else "left"
        out = df
        for other, prefix in zip(others, prefixes):
            out = ops.asof_join(out, other, keys, ts_col="ts", direction="nearest",
                                tolerance=tol, right_prefix=prefix, how=how)
        return out

    def node_join2(self, df, node: NodeCall) -> DataFrame:
        """faxe join2 (esp_join2.erl:50): multi-row-per-ts all-pairs
        within tolerance => interval join, folded over the input refs."""
        others = [self.env[a[1]] for a in node.args
                  if isinstance(a, tuple) and a[0] == "ref"]
        tol = self._dur(node.params["tolerance"][0]) if "tolerance" in node.params else "1s"
        prefixes = node.params.get("prefix", [f"r{i}_" for i in range(len(others) + 1)])
        keys = self.group_keys or []  # keyless: pure time-window pairing
        out = df
        for other, prefix in zip(others, prefixes[1:] if len(prefixes) > len(others)
                                 else prefixes):
            out = ops.interval_join(out, other, keys, ts_col="ts",
                                    tolerance=tol, right_prefix=prefix)
        return out

    def node_collect(self, df, node: NodeCall) -> DataFrame:
        """faxe collect batch analog (esp_collect.erl:63): final upsert
        state — .add() compiles to a pre-filter (rows eligible to enter
        the buffer), .remove() to the final-action drop; streaming
        lambdas/aging live in streaming.stateful.collect_full_stream."""
        keys = [k for k in node.params.get("key_fields", [])
                if isinstance(k, str)] or [a for a in node.args if isinstance(a, str)]
        if not keys:
            raise NotImplementedError("DFS collect needs key_fields")
        if "add" in node.params:
            df = df.filter(truthy(self._lam(node.params["add"][0])))
        remove = None
        if "remove" in node.params:
            remove = truthy(self._lam(node.params["remove"][0]))
        max_ts_age = (self._dur(node.params["max_ts_age"][0])
                      if "max_ts_age" in node.params else None)
        return ops.collect_table(df, keys, remove_when=remove,
                                 max_ts_age=max_ts_age, ts_col="ts")

    def node_mem(self, df, node: NodeCall) -> DataFrame:
        """faxe mem (esp_mem.erl:31): with .field(), values are gathered
        FROM the flow into flow-wide memory (single/list/set; batch
        analog = aggregate at this node, lambda_lib.mem_write); without,
        it is a pre-populated lookup from .default()."""
        from faxe_spark.functions.lambda_lib import mem_write, set_mem

        key = node.params.get("key", node.args or [None])[0]
        field_ = node.params.get("field", [None])[0]
        default = self._val(node.params.get("default", [None])[0])
        mtype = node.params.get("type", ["single"])[0]
        if field_ is not None:
            if key is None:
                key = field_
            df = mem_write(df, field_, key=str(key), type=str(mtype))
            self.consts[str(key)] = None  # resolved via mem() at eval
            return df
        if key is None:
            raise NotImplementedError("DFS mem needs .key() or .field()")
        if "default_json" in node.params and isinstance(default, str):
            default = json.loads(default)
        set_mem(str(key), default)
        self.consts[str(key)] = default
        return df

    def node_statistics(self, df, node: NodeCall) -> DataFrame:
        """faxe statistics (esp_statistics.erl): the stats-module list as
        one multi-spec aggregate over the pending window/batch group."""
        self._restore_window(df)
        modules = [m for m in node.params.get("modules", []) if isinstance(m, str)]
        field = node.params.get("field", ["value"])[0]
        df, (field,) = self._materialize_paths(df, [field])
        specs = [(field, m, f"{field}_{m}") for m in modules]
        return ops.aggregate(df, specs, by=self._agg_keys())

    def node_state_sequence(self, df, node: NodeCall) -> DataFrame:
        """faxe state_sequence (esp_state_sequence.erl:47): the .states()
        lambdas in order; extra input refs union in first (the reference
        wires them as inports)."""
        others = [self.env[a[1]] for a in node.args
                  if isinstance(a, tuple) and a[0] == "ref" and a[1] in self.env]
        out = ops.union_streams(df, *others) if others else df
        steps = [truthy(self._lam(s)) for s in node.params.get("states", [])]
        wd = node.params.get("within", [])
        timeouts = [parse_duration_ms(_dur_str(w)) for w in wd] \
            or [3_600_000] * max(len(steps) - 1, 0)
        return ops.state_sequence(out, steps, timeouts, by=self.group_keys)

    def node_state_change_bulk(self, df, node: NodeCall) -> DataFrame:
        """faxe state_change_bulk (esp_state_change_bulk.erl:53): one FSM
        per listed field; $field condition from .state_value()."""
        from pyspark.sql.types import StructType

        fields_ = [f for f in node.params.get("field", []) if isinstance(f, str)]
        if not fields_:
            raise NotImplementedError("DFS state_change_bulk needs .field()")
        excl = set(node.params.get("exclude_fields", []))
        # an OBJECT-valued field means "every member of that object" —
        # the reference's $field template iterates the map's keys
        # (esp_state_change_bulk.erl:53)
        expanded = []
        for f in fields_:
            dt = None
            if f in df.columns:
                dt = df.schema[f].dataType
            else:
                cur, ok = df.schema, True
                for seg in f.split("."):
                    if isinstance(cur, StructType) and seg in cur.fieldNames():
                        cur = cur[seg].dataType
                    else:
                        ok = False
                        break
                dt = cur if ok else None
            if isinstance(dt, StructType):
                expanded += [f"{f}.{c}" for c in dt.fieldNames()
                             if f"{f}.{c}" not in excl]
            else:
                expanded.append(f)
        df, fields_ = self._materialize_paths(df, expanded)
        sv = self._val(node.params.get("state_value", [1])[0])
        # the melt (ops.state_change_bulk) turns the listed fields into
        # (field, value) rows with value CAST to DOUBLE — the condition
        # must target that melted column, not the original field name
        # (which no longer exists post-stack).
        cond = F.col("value") == F.lit(sv).cast("double")
        return ops.state_change_bulk(df, fields_, cond, by=self.group_keys, ts_col="ts")

    # queue-window variants: same window semantics, emit-from-queue is a
    # runtime detail the row model subsumes (esp_win_time_q / win_event_q)
    def node_win_time_q(self, df, node: NodeCall) -> DataFrame:
        return self.node_win_time(df, node)

    def node_win_event_q(self, df, node: NodeCall) -> DataFrame:
        return self.node_win_event(df, node)

    def _broker_node(self, node: NodeCall, topic_key: str) -> DataFrame:
        """mqtt_subscribe / amqp_consume (esp_mqtt_subscribe.erl:47,
        esp_amqp_consume.erl:68) against an injected EmbeddedBroker:
        topic subscription + dt_field/dt_format payload time + dedup.
        Production deployments use kafka_source (broker protocol owned
        by an MQTT/AMQP->Kafka bridge); the embedded broker gives the
        node's OPTION semantics an executable DFS path in tests."""
        if self.broker is None:
            raise NotImplementedError(
                f"DFS {node.name} needs a live broker: pass "
                "DFSCompiler(broker=EmbeddedBroker()) for tests, or use "
                "sources.kafka_source in production (SURVEY §2.1)")
        from faxe_spark.sources.embedded_broker import broker_source

        topic = str(self._val(node.params.get(topic_key, node.args or ["t"])[0]))
        # schema from the already-published log (jiffy-style inference);
        # an empty topic reads as a raw string payload column
        msgs = self.broker.messages(topic)
        if msgs:
            schema = self.spark.read.json(
                self.spark.sparkContext.parallelize(msgs, 1)).schema
        else:
            schema = "payload string"
        dt_field = self._val(node.params.get("dt_field", [None])[0])
        dt_format = str(self._val(node.params.get("dt_format", ["millisecond"])[0]))
        dedup = node.params.get("dedup_size", [None])[0]
        return broker_source(
            self.spark, self.broker, topic,
            value_schema=schema, dt_field=dt_field, dt_format=dt_format,
            dedup_size=int(self._val(dedup)) if dedup is not None else None,
            topic_as=str(node.params.get("topic_as", ["topic"])[0]),
            include_topic="include_topic" not in node.params
            or str(node.params["include_topic"][0]).lower() != "false")

    def node_http_listen(self, df, node: NodeCall) -> DataFrame:
        """http_listen (esp_http_listen.erl:30): embedded HTTP server
        spooling payloads into a checkpointable file stream. Port 0 =
        ephemeral (corpus scripts' fixed ports can't be assumed free);
        the bound port and the listener handle land on self.listeners
        for the caller to publish to / stop()."""
        from faxe_spark.sources import http_listen_source

        port = int(self._val(node.params.get("port", [0])[0]))
        # keep the requested port only in the safe unprivileged range;
        # anything else (privileged, junk, >65535) binds ephemeral
        listener = http_listen_source(
            self.spark, port=port if 1024 <= port <= 65000 else 0,
            path=str(node.params.get("path", ["/"])[0]),
            user=node.params.get("user", [None])[0],
            password=node.params.get("pass", [None])[0])
        self.listeners.append(listener)
        return listener.df

    def node_mqtt_subscribe(self, df, node: NodeCall) -> DataFrame:
        return self._broker_node(node, "topic")

    def node_amqp_consume(self, df, node: NodeCall) -> DataFrame:
        return self._broker_node(node, "queue")

    # -- connector nodes ---------------------------------------------------
    def _url(self, node: NodeCall, default_port: int = 80) -> str:
        host = node.params.get("host", ["localhost"])[0]
        port = int(self._val(node.params.get("port", [default_port])[0]))
        path = node.params.get("path", ["/"])[0]
        scheme = "https" if "tls" in node.params else "http"
        return f"{scheme}://{host}:{port}{path if str(path).startswith('/') else '/' + str(path)}"

    def node_http_get(self, df, node: NodeCall) -> DataFrame:
        """esp_http_get.erl:38 — .every() makes it the streaming poller,
        else a one-shot batch GET."""
        from faxe_spark.sources import http_get_source, http_poll_source

        url = self._url(node)
        if "every" in node.params:
            return http_poll_source(self.spark, url,
                                    every=self._dur(node.params["every"][0]),
                                    align="align" in node.params)
        return http_get_source(self.spark, url)

    def node_tcp_recv_line(self, df, node: NodeCall) -> DataFrame:
        """esp_tcp_recv_line.erl:40 — line-framed socket stream."""
        from faxe_spark.sources import socket_source

        return socket_source(
            self.spark,
            host=node.params.get("ip", node.params.get("host", ["localhost"]))[0],
            port=int(self._val(node.params["port"][0])),
            min_length=int(self._val(node.params.get("min_length", [0])[0])))

    node_tcp_recv = node_tcp_recv_line

    def node_udp_recv(self, df, node: NodeCall) -> DataFrame:
        """esp_udp_recv.erl:45 — spooled datagram listener stream."""
        from faxe_spark.sources import udp_source

        lis = udp_source(self.spark,
                         port=int(self._val(node.params.get("port", [0])[0])),
                         changed="changed" in node.params)
        self.listeners.append(lis)
        return lis.df

    # -- PLC / DB source nodes --------------------------------------------
    # The wire protocols (snap7, Modbus TCP, Mongo, Oracle/Postgres
    # drivers) cannot run in this container, but everything the
    # reference computes BEFORE the wire — option validation, the
    # register-coalescing read plan, the time-bucket SQL rewrite, the
    # JDBC URL — is built for real and recorded on self.plc_plans /
    # self.connector_specs. The node compiles to a typed empty frame
    # with the exact schema a live reader would emit, so every
    # downstream node sees the real shape and the whole script
    # resolves end-to-end.

    def _typed_stub(self, leaf_types: list[tuple[str, str]]) -> DataFrame:
        """Empty frame: ts + one (possibly dotted → nested-struct)
        column per alias, typed like the live decode would produce."""
        from faxe_spark.paths import set_path

        out = self.spark.createDataFrame([], schema="ts timestamp")
        for name, sql_type in leaf_types:
            out = set_path(out, name, F.lit(None).cast(sql_type))
        return out

    def _str_list(self, node: NodeCall, key: str) -> list[str]:
        return [str(self._val(v)) for v in node.params.get(key, [])]

    def node_s7read(self, df, node: NodeCall) -> DataFrame:
        """esp_s7read.erl:63 — coalesced S7 bulk-read poller. The
        build_addresses planner (:356-455, ported at plc.py) turns the
        .vars() list into the minimal wire-request plan; aliases type
        from the parsed address dtype. The recorded plan executes live
        via sources/s7.py (S7Client.read_plan — ISO-on-TCP/S7comm),
        tested against the embedded S7Server like the modbus bridge."""
        from faxe_spark.plc import SPARK_TYPE, parse_address, plan_bulk_reads

        addrs = self._str_list(node, "vars")
        aliases = self._str_list(node, "as")
        if len(addrs) != len(aliases):
            raise ValueError(  # esp_s7read.erl:91 option check
                "s7read: different count for addresses and aliases")
        plan = plan_bulk_reads(addrs, aliases)
        self.plc_plans.append({
            "node": "s7read",
            "ip": str(self._val(node.params.get("ip", ["localhost"])[0])),
            "rack": int(self._val(node.params.get("rack", [0])[0])),
            "slot": int(self._val(node.params.get("slot", [1])[0])),
            "every": (self._dur(node.params["every"][0])
                      if "every" in node.params else "1s"),
            "diff": "diff" in node.params,
            "requests": plan,
        })
        leaf = [(a, SPARK_TYPE[parse_address(ad)["dtype"]])
                for ad, a in zip(addrs, aliases)]
        return self._typed_stub(leaf)

    # esp_modbus_read.erl .output() decode classes → Spark column types
    _MODBUS_OUT = {"int16": "int", "uint16": "int", "int32": "bigint",
                   "uint32": "bigint", "float32": "double",
                   "double": "double", "coils": "boolean",
                   "ascii": "string"}

    def node_modbus(self, df, node: NodeCall) -> DataFrame:
        """esp_modbus_read.erl:81 — periodic register poller; requests
        with back-to-back ranges and equal decode opts merge into one
        wire read (plan_modbus_reads, plc.py:179)."""
        from faxe_spark.plc import plan_modbus_reads

        functions = self._str_list(node, "function")
        starts = [int(self._val(v)) for v in node.params.get("from", [])]
        counts = [int(self._val(v)) for v in node.params.get("count", [])]
        aliases = self._str_list(node, "as")
        outputs = self._str_list(node, "output") or None
        signed = [str(self._val(v)).lower() == "true"
                  for v in node.params.get("signed", [])] or None
        plan = plan_modbus_reads(functions, starts, counts, aliases,
                                 outputs=outputs, signed=signed)
        self.plc_plans.append({
            "node": node.name,
            "ip": str(self._val(node.params.get("ip", ["localhost"])[0])),
            "port": int(self._val(node.params.get("port", [502])[0])),
            "device": int(self._val(node.params.get("device", [255])[0])),
            "every": (self._dur(node.params["every"][0])
                      if "every" in node.params else "1s"),
            "align": "align" in node.params,
            "requests": plan,
        })
        outs = outputs or [""] * len(aliases)
        # no-output reads decode as raw 16-bit words (and bit reads as
        # 0/1 ints) in the live lane (sources/modbus.py decode fmt "")
        # — the stub schema must agree, so no-output coils are int
        leaf = [(a, self._MODBUS_OUT.get(o.lower(), "int"))
                for a, o, f in zip(aliases, outs, functions)]
        return self._typed_stub(leaf)

    node_modbus_multi = node_modbus

    def node_mongo_query(self, df, node: NodeCall) -> DataFrame:
        """esp_mongo_query.erl:40 — periodic collection query; the
        filter document is validated as JSON and the doc lands under
        the .as() path (default 'data') as the reference nests it."""
        query = str(self._val(node.params.get("query", ["{}"])[0]))
        try:
            json.loads(query)
        except ValueError as e:
            raise ValueError(f"mongo_query: .query() is not valid "
                             f"JSON: {e}") from None
        as_path = str(self._val(node.params.get("as", ["data"])[0]))
        self.connector_specs.append({
            "node": "mongo_query",
            "host": str(self._val(node.params.get("host", ["localhost"])[0])),
            "port": int(self._val(node.params.get("port", [27017])[0])),
            "database": str(self._val(node.params.get("database", [""])[0])),
            "collection": str(
                self._val(node.params.get("collection", [""])[0])),
            "query": query,
            "every": (self._dur(node.params["every"][0])
                      if "every" in node.params else "5s"),
            "as": as_path,
        })
        # document shape is schema-on-read: the doc column is the raw
        # JSON string; dotted reads fall through get_path_safe's JSON
        # extraction like flowdata's map access
        return self._typed_stub([(as_path, "string")])

    def _jdbc_query_node(self, node: NodeCall, *, kind: str,
                         url: str) -> DataFrame:
        query = str(self._val(node.params.get("query", [""])[0])).strip()
        if not query:
            raise ValueError(f"{kind}: .query() is required")
        gbt = node.params.get("group_by_time", [None])[0]
        if gbt is not None:
            from faxe_spark.sources import time_bucket_query
            query = time_bucket_query(query,
                                      group_by_time=self._dur(gbt))
        self.connector_specs.append({
            "node": kind, "url": url, "query": query,
            "user": str(self._val(node.params.get("user", [""])[0])),
            "every": (self._dur(node.params["every"][0])
                      if "every" in node.params else "10s"),
            "align": "align" in node.params,
        })
        return self._typed_stub([])

    def node_postgresql_query(self, df, node: NodeCall) -> DataFrame:
        """esp_postgre_statement / pg corpus node — jdbc_source pushdown
        with the crate-style group_by_time rewrite applied up front.
        The recorded spec also executes live over the v3 wire protocol
        (sources/pgwire.py, embedded-endpoint bridge test)."""
        host = str(self._val(node.params.get("host", ["localhost"])[0]))
        port = int(self._val(node.params.get("port", [5432])[0]))
        db = str(self._val(node.params.get("database", ["postgres"])[0]))
        return self._jdbc_query_node(
            node, kind="postgresql_query",
            url=f"jdbc:postgresql://{host}:{port}/{db}")

    def node_crate_query(self, df, node: NodeCall) -> DataFrame:
        """esp_crate_query.erl:45 — CrateDB speaks the PG wire protocol
        (port 5432 HTTP-side default 4200; the reference uses the
        pg-compatible port), so the node is the postgresql_query shape
        with the crate default port; crate_query_cont adds the
        advancing-range poller (sources/pgwire.py pg_poll_source)."""
        host = str(self._val(node.params.get("host", ["localhost"])[0]))
        port = int(self._val(node.params.get("port", [5432])[0]))
        db = str(self._val(node.params.get("database", ["doc"])[0]))
        return self._jdbc_query_node(
            node, kind=node.name,
            url=f"jdbc:postgresql://{host}:{port}/{db}")

    node_crate_query_cont = node_crate_query

    def node_postgre_statement(self, df, node: NodeCall) -> DataFrame:
        """esp_postgre_statement.erl — one-shot (or `every`-periodic)
        statement; executes live via pgwire.postgre_statement_df."""
        stmt = str(self._val(node.params.get(
            "statement", node.params.get("query", [""]))[0])).strip()
        if not stmt:
            raise ValueError("postgre_statement: .statement() is required"
                             " (one_of_params statement/statement_field)")
        host = str(self._val(node.params.get("host", ["localhost"])[0]))
        port = int(self._val(node.params.get("port", [5432])[0]))
        db = str(self._val(node.params.get("database", ["postgres"])[0]))
        self.connector_specs.append({
            "node": "postgre_statement", "host": host, "port": port,
            "database": db, "statement": stmt,
            "user": str(self._val(node.params.get("user", [""])[0])),
            "every": (self._dur(node.params["every"][0])
                      if "every" in node.params else None),
        })
        return self._typed_stub([])

    def node_oracle_query(self, df, node: NodeCall) -> DataFrame:
        """esp_oracle_query analog — thin-driver JDBC URL from
        host/port/service_name, raw-query pushdown."""
        host = str(self._val(node.params.get("host", ["localhost"])[0]))
        port = int(self._val(node.params.get("port", [1521])[0]))
        svc = str(self._val(node.params.get("service_name", [""])[0]))
        return self._jdbc_query_node(
            node, kind="oracle_query",
            url=f"jdbc:oracle:thin:@//{host}:{port}/{svc}")

    def node_conn_status(self, df, node: NodeCall) -> DataFrame:
        """esp_conn_status.erl:35-50 — subscribe the connection-status
        event bus with flow/node/type filters and re-emit the status
        points. Compiles against the process-global registry that
        connector sources/sinks report into."""
        from faxe_spark.streaming.metrics import CONN_STATUS

        return CONN_STATUS.frame(
            self.spark,
            flow_id=node.params.get("flow", [None])[0],
            node_id=node.params.get("node", [None])[0],
            conn_type=node.params.get("type", [None])[0])

    def node_deadman(self, df, node: NodeCall) -> DataFrame:
        """esp_deadman.erl:43 — wall-clock watchdog on a stream; on a
        batch frame it compiles to the event-time gap analog
        (ops.deadman_gaps), keeping the node oracle-checkable."""
        from faxe_spark.durations import parse_duration_ms
        from faxe_spark.streaming.stateful import deadman_stream

        timeout = (node.args[0] if node.args
                   else node.params.get("timeout", ["30s"])[0])
        if df.isStreaming:
            key = self.group_keys[0] if self.group_keys else node.params["key"][0]
            return deadman_stream(df, key_col=key, timeout=self._dur(timeout))
        fields_ = [f for f in node.params.get("fields", []) if isinstance(f, str)]
        values = [self._val(v) for v in node.params.get("field_values", [])]
        return ops.deadman_gaps(
            df, parse_duration_ms(self._dur(timeout)), by=self.group_keys,
            fields=dict(zip(fields_, values)) or None,
            repeat_last="repeat_last" in node.params,
            no_forward="no_forward" in node.params)

    def node_triggered_timeout(self, df, node: NodeCall) -> DataFrame:
        """esp_triggered_timeout.erl — arm on trigger rows, fire after
        timeout unless a cancel row (the extra input ref) arrives."""
        from faxe_spark.streaming.stateful import triggered_timeout_stream

        others = [self.env[a[1]] for a in node.args
                  if isinstance(a, tuple) and a[0] == "ref" and a[1] in self.env]
        out = ops.union_streams(df, *others) if others else df
        if not out.isStreaming:
            # batch analog: event-time gap after a trigger row
            from faxe_spark.durations import parse_duration_ms

            self._current_df = out
            trig = truthy(self._lam(node.params["timeout_trigger"][0]))
            fields_ = [f for f in node.params.get("fields", []) if isinstance(f, str)]
            values = [self._val(v) for v in node.params.get("field_values", [])]
            return ops.triggered_timeout_gaps(
                out, trig,
                parse_duration_ms(self._dur(node.params["timeout"][0])),
                by=self.group_keys, fields=dict(zip(fields_, values)) or None)
        key = self.group_keys[0] if self.group_keys else node.params["key"][0]
        trig = truthy(self._lam(node.params["timeout_trigger"][0]))
        cancel = (truthy(self._lam(node.params["cancel"][0]))
                  if "cancel" in node.params else ~trig)
        out = out.withColumn("_trig", trig).withColumn("_cancel", cancel)
        return triggered_timeout_stream(
            out, key_col=key, trigger_col="_trig", cancel_col="_cancel",
            timeout=_dur_str(self._val(node.params["timeout"][0])))

    # sinks: recorded as deferred actions (the runner applies them /
    # foreachBatch at stream start); the flow passes through so a DFS
    # script ending in a sink still yields its final DataFrame.
    def _defer_sink(self, df, node: NodeCall, kind: str, **spec) -> DataFrame:
        self.sinks.append({"kind": kind, "node": node.name, **spec})
        return df

    def node_http_post(self, df, node: NodeCall) -> DataFrame:
        return self._defer_sink(df, node, "http_post", url=self._url(node))

    def node_http_post_crate(self, df, node: NodeCall) -> DataFrame:
        """esp_http_post_crate.erl:45 — the /_sql {stmt, bulk_args}
        bulk writer; binds to sinks.crate_http.http_post_crate (live,
        embedded-endpoint tested), NOT the plain-JSON http_post."""
        return self._defer_sink(
            df, node, "http_post_crate",
            host=str(self._val(node.params.get("host", ["localhost"])[0])),
            port=int(self._val(node.params.get("port", [4200])[0])),
            table=str(self._val(node.params.get("table", [""])[0])),
            database=str(self._val(node.params.get("database", ["doc"])[0])),
            db_fields=self._str_list(node, "db_fields"),
            faxe_fields=self._str_list(node, "faxe_fields") or None,
            remaining_fields_as=(
                str(self._val(node.params["remaining_fields_as"][0]))
                if "remaining_fields_as" in node.params else None),
            user=(str(self._val(node.params["user"][0]))
                  if "user" in node.params else None),
            password=(str(self._val(node.params["pass"][0]))
                      if "pass" in node.params else ""))

    def node_email(self, df, node: NodeCall) -> DataFrame:
        return self._defer_sink(
            df, node, "email",
            to=[t for t in node.params.get("to", []) if isinstance(t, str)],
            subject=node.params.get("subject", [""])[0])

    def node_mqtt_publish(self, df, node: NodeCall) -> DataFrame:
        """esp_mqtt_publish.erl — broker egress via the kafka_sink
        analog; topic recorded, broker bound at stream start."""
        return self._defer_sink(
            df, node, "broker_publish",
            topic=node.params.get("topic", node.params.get("topic_lambda", [""]))[0],
            host=node.params.get("host", ["localhost"])[0])

    node_amqp_publish = node_mqtt_publish

    def node_influx_out(self, df, node: NodeCall) -> DataFrame:
        """esp_influx_out.erl:23 — line-protocol HTTP writer; the
        deferred sink binds to sinks.influx.influx_sink (live lane,
        embedded-endpoint tested) at flow start."""
        return self._defer_sink(
            df, node, "influx_write",
            measurement=str(self._val(node.params.get(
                "measurement", node.params.get("table", [""]))[0])),
            database=str(self._val(node.params.get("database", [""])[0])),
            host=str(self._val(node.params.get("host", ["localhost"])[0])),
            port=int(self._val(node.params.get("port", [8086])[0])),
            user=(str(self._val(node.params["user"][0]))
                  if "user" in node.params else None),
            password=(str(self._val(node.params["pass"][0]))
                      if "pass" in node.params else ""))

    def node_crate_out(self, df, node: NodeCall) -> DataFrame:
        return self._defer_sink(
            df, node, "jdbc_write",
            table=node.params.get("table", [""])[0],
            host=node.params.get("host", ["localhost"])[0])

    node_postgre_out = node_crate_out

    def node_win_event(self, df, node: NodeCall) -> DataFrame:
        every = int(self._val(node.params.get("every", [1])[0]))
        period = int(self._val(node.params["period"][0])) \
            if "period" in node.params else every
        self.count_window = (period, every)
        self._fill_period = "fill_period" in node.params
        return df

    def node_win_clock(self, df, node: NodeCall) -> DataFrame:
        """Batch analog of the processing-time clock window: event-time
        window of the same size (esp_win_clock.erl:33; exact wall-clock
        semantics live in faxe_spark.streaming.windows.win_clock)."""
        every = self._dur(node.params["every"][0])
        period = self._dur(node.params["period"][0]) if "period" in node.params else every
        self.window = ops.win_time("ts", period, every).alias("window")
        self._fill_period = "fill_period" in node.params
        self._window_src = df
        self._df_windows[id(df)] = (self.window, self._fill_period, df)
        return df

    def node_batch(self, df, node: NodeCall) -> DataFrame:
        size = int(self._val(node.args[0] if node.args
                             else node.params["size"][0]))
        out = ops.batch_by_count(df, size, by=self.group_keys)
        self.group_keys = self.group_keys + ["batch_id"]
        return out

    def node_case(self, df, node: NodeCall) -> DataFrame:
        conditions = [truthy(self._lam(a)) for a in node.args]
        values = [self._val(v) for v in node.params.get("values", [])]
        alias = node.params["as"][0]
        default = self._val(node.params.get("default", [None])[0])
        return ops.case_when(df, conditions, values, alias, default=default)

    def node_if(self, df, node: NodeCall) -> DataFrame:
        test_src = node.args[0] if node.args else node.params["test"][0]
        test = truthy(self._lam(test_src))
        then_v = self._val(node.params.get("then", [None])[0])
        else_v = self._val(node.params.get("else", [None])[0])
        alias = node.params["as"][0]
        if isinstance(then_v, Lambda):
            then_v = self._lam(then_v)
        if isinstance(else_v, Lambda):
            else_v = self._lam(else_v)
        return ops.if_else(df, test, then_v, else_v, alias)

    def node_change_detect(self, df, node: NodeCall) -> DataFrame:
        fields_ = list(node.args) + list(node.params.get("fields", []))
        df, names = self._materialize_paths(df, fields_)
        return ops.change_detect(df, names, by=self.group_keys)

    def node_count_change(self, df, node: NodeCall) -> DataFrame:
        field = node.args[0] if node.args else node.params["field"][0]
        alias = node.params.get("as", [f"{field}_count_change"])[0]
        df, (field,) = self._materialize_paths(df, [field])
        return ops.count_change(df, field, by=self.group_keys, alias=alias)

    # -- time-series similarity (beyond the reference surface — the
    #    Matrix-Profile family, mirrored from the Flow builder): the
    #    series key is the upstream group_by key, ts is the event time.
    def _ts_series_key(self, node_name: str) -> str:
        if len(self.group_keys) != 1:
            raise ValueError(
                f"{node_name} needs exactly one group_by key upstream "
                f"as the series key; got {self.group_keys or 'none'}")
        return self.group_keys[0]

    def node_subsequence_topk(self, df, node: NodeCall) -> DataFrame:
        pattern = [float(x) for x in
                   (node.params.get("pattern") or list(node.args))]
        field = node.params.get("field", ["value"])[0]
        k = int(node.params.get("k", [10])[0])
        df, (field,) = self._materialize_paths(df, [field])
        return ops.subsequence_topk(
            df, pattern, key_col=self._ts_series_key("subsequence_topk"),
            ts_col="ts", value_col=field, k=k,
            per_key="per_key" in node.params)

    def node_motif_topk(self, df, node: NodeCall) -> DataFrame:
        m = int(node.args[0] if node.args else node.params["m"][0])
        field = node.params.get("field", ["value"])[0]
        k = int(node.params.get("k", [3])[0])
        df, (field,) = self._materialize_paths(df, [field])
        return ops.motif_topk(
            df, key_col=self._ts_series_key("motif_topk"), ts_col="ts",
            value_col=field, m=m, k=k)

    def node_discord_topk(self, df, node: NodeCall) -> DataFrame:
        m = int(node.args[0] if node.args else node.params["m"][0])
        field = node.params.get("field", ["value"])[0]
        k = int(node.params.get("k", [3])[0])
        df, (field,) = self._materialize_paths(df, [field])
        return ops.discord_topk(
            df, key_col=self._ts_series_key("discord_topk"), ts_col="ts",
            value_col=field, m=m, k=k)

    def node_subsequence_match(self, df, node: NodeCall) -> DataFrame:
        """Shape alerting (VERDICT r7 #6, mirroring node_deadman's
        two-lane form): on a streaming input, the stateful matcher
        (state per key = the m-1 reading tail); on batch, the exact
        analog. `pattern(...)` is the shape, `max_dist` the alert
        threshold — pipe into any sink node for the alarm."""
        pattern = [float(x) for x in
                   (node.params.get("pattern") or list(node.args))]
        field = node.params.get("field", ["value"])[0]
        max_dist = float(self._val(node.params.get("max_dist", [0.5])[0]))
        key = self._ts_series_key("subsequence_match")
        # materialize dot-path fields in BOTH lanes (pure column
        # exprs — they compile on a streaming DataFrame too)
        df, (field,) = self._materialize_paths(df, [field])
        if df.isStreaming:
            from faxe_spark.streaming.stateful import \
                subsequence_match_stream
            return subsequence_match_stream(
                df, pattern, key_col=key, ts_col="ts", value_col=field,
                max_dist=max_dist)
        return ops.subsequence_match(
            df, pattern, key_col=key, ts_col="ts", value_col=field,
            max_dist=max_dist)

    def node_dsir_resample(self, df, node: NodeCall) -> DataFrame:
        """Training-corpus DSIR selection on the DFS surface (VERDICT
        r8 #6): `|dsir_resample(lambda: label == 'wiki').k(1000)` keeps
        the k docs whose hashed-ngram importance toward the lambda-
        flagged target subset is highest. Options mirror the library
        op: .text('text') .id('doc_id') .buckets(256) .seed('dsir')
        .salt(8)."""
        from faxe_spark.operators.trainprep import dsir_resample

        if node.args:
            src = node.args[0]
        elif "target" in node.params:
            src = node.params["target"][0]
        else:
            raise ValueError(
                "dsir_resample needs a target lambda: "
                "|dsir_resample(lambda: label == 'wiki').k(1000)")
        if "k" not in node.params:
            raise ValueError(
                "dsir_resample needs .k(<count>): "
                "|dsir_resample(lambda: label == 'wiki').k(1000)")
        flag = truthy(self._lam(src))
        kw = {}
        if "buckets" in node.params:
            kw["buckets"] = int(self._val(node.params["buckets"][0]))
        if "seed" in node.params:
            kw["seed"] = str(self._val(node.params["seed"][0]))
        if "salt" in node.params:
            kw["salt"] = int(self._val(node.params["salt"][0]))
        return dsir_resample(
            df, target_flag=flag,
            k=int(self._val(node.params["k"][0])),
            text_col=node.params.get("text", ["text"])[0],
            id_col=node.params.get("id", ["doc_id"])[0], **kw)

    def node_shard(self, df, node: NodeCall) -> DataFrame:
        """Deterministic global shuffle: `|shard(16)` assigns shard +
        shard_pos via trainprep.shard_assign (one shuffle; shard count
        = writer parallelism). Options: .id('doc_id') .seed('shuffle')."""
        from faxe_spark.operators.trainprep import shard_assign

        if node.args:
            n = node.args[0]
        elif "shards" in node.params:
            n = node.params["shards"][0]
        else:
            raise ValueError(
                "shard needs a shard count: |shard(16) or "
                "|shard().shards(16)")
        return shard_assign(
            df, n_shards=int(self._val(n)),
            id_col=node.params.get("id", ["doc_id"])[0],
            seed=str(self._val(node.params.get("seed", ["shuffle"])[0])))

    def node_split(self, df, node: NodeCall) -> DataFrame:
        """Train/val/test assignment: `|split().names('train','val')
        .fractions(0.9, 0.1)` adds a `split` column via
        trainprep.split_assign (scan-stage, no shuffle). Options:
        .id('doc_id') .seed('split')."""
        from faxe_spark.operators.trainprep import split_assign

        names = [str(self._val(x)) for x in node.params.get("names", [])]
        fracs = [float(self._val(x))
                 for x in node.params.get("fractions", [])]
        if not names or len(names) != len(fracs):
            raise ValueError(
                "split needs .names(...) and .fractions(...) of equal "
                f"length, got {len(names)} names / {len(fracs)} fractions")
        if len(set(names)) != len(names):
            # review find: dict(zip(...)) would silently drop the
            # duplicate's fraction and subsample the corpus instead
            raise ValueError(f"split names must be unique, got {names}")
        return split_assign(
            df, dict(zip(names, fracs)),
            id_col=node.params.get("id", ["doc_id"])[0],
            seed=str(self._val(node.params.get("seed", ["split"])[0])))

    def _state_table(self, ref) -> DataFrame:
        """Resolve a fold node's carried-state option (.counts/.best):
        a `ref` to a script var / injected source wins; a `def` const
        may hold the table NAME; a plain name tries env first, then a
        parquet table in tables_dir. Unresolvable refs fail with the
        node convention's descriptive ValueError, not a bare
        KeyError (review find)."""
        from faxe_spark.tables import load_table

        if isinstance(ref, tuple) and ref[0] == "ref":
            if ref[1] in self.env:
                return self.env[ref[1]]
            if ref[1] in self.consts:
                ref = self.consts[ref[1]]   # const holds the name
            else:
                raise ValueError(
                    f"carried-state ref '{ref[1]}' is neither a "
                    "script var / injected source nor a def-const "
                    "naming one — pass .counts('<name>') / "
                    ".best('<name>') with a source from sources={...}"
                    " or a parquet table in tables_dir")
        name = str(self._val(ref))
        if name in self.env:
            return self.env[name]
        if self.tables_dir is None:
            # ADVICE r10: without this, load_table(None, name) surfaces
            # as PATH_NOT_FOUND on 'None/<name>.parquet' — confusing
            raise ValueError(
                f"carried-state table '{name}' is not a script var / "
                "injected source and no tables_dir was configured — "
                "pass sources={...} to run()/compile() or set "
                "tables_dir so '<tables_dir>/" + name + ".parquet' "
                "can resolve")
        return load_table(self.spark, self.tables_dir, name)

    def node_shard_append(self, df, node: NodeCall) -> DataFrame:
        """Append-stable shard layout on the DFS surface (VERDICT r9
        #4): `|shard_append(8)` emits each doc's deterministic shard +
        a shard_pos appended past everything already written.
        `.counts('name')` names the carried (shard, _cnt) state from
        prior epochs — a script var / injected source (env) first,
        else a parquet table in tables_dir; omit for the first epoch.
        `.id(...)` `.seed(...)` as shard. The one-epoch member of the
        trainprep.shard_append fold — the loop itself lives in the
        library/streaming forms."""
        from faxe_spark.operators.trainprep import _shard_append_core

        if node.args:
            n = node.args[0]
        elif "shards" in node.params:
            n = node.params["shards"][0]
        else:
            raise ValueError(
                "shard_append needs a shard count: |shard_append(16) "
                "or |shard_append().shards(16)")
        counts = None
        if "counts" in node.params:
            counts = self._state_table(node.params["counts"][0])
        appended, _ = _shard_append_core(
            df, counts, n_shards=int(self._val(n)),
            id_col=node.params.get("id", ["doc_id"])[0],
            seed=str(self._val(node.params.get("seed", ["shuffle"])[0])),
            checkpoint=True)
        return appended

    def node_dsir_select(self, df, node: NodeCall) -> DataFrame:
        """Frozen-weight DSIR selection on the DFS surface (VERDICT
        r9 #4): `|dsir_select().k(100).weights('wiki')` scores docs
        against the persisted weight table save_dsir_weights wrote
        under that name and emits the top-k of best ∪ this epoch —
        the output IS the updated k-row carried state.
        `.best('name')` names the prior epochs' selection — a script
        var / injected source (env) first, else a parquet table in
        tables_dir; omit for the first epoch.
        `.text/.id/.buckets/.seed/.scale/.salt` as dsir_resample."""
        from faxe_spark.operators import trainprep as tp

        if "k" not in node.params:
            raise ValueError(
                "dsir_select needs .k(<count>): "
                "|dsir_select().k(100).weights('wiki')")
        if "weights" not in node.params:
            raise ValueError(
                "dsir_select needs .weights('<name>') — a weight "
                "table persisted via save_dsir_weights")
        weights = tp.load_dsir_weights(
            self.spark, name=str(self._val(node.params["weights"][0])))
        best = None
        if "best" in node.params:
            best = self._state_table(node.params["best"][0])
        kw = {}
        for opt, cast in (("buckets", int), ("seed", str),
                          ("scale", int), ("salt", int)):
            if opt in node.params:
                kw[opt] = cast(self._val(node.params[opt][0]))
        return tp.dsir_select_incremental(
            df, best, weights=weights,
            k=int(self._val(node.params["k"][0])),
            text_col=node.params.get("text", ["text"])[0],
            id_col=node.params.get("id", ["doc_id"])[0], **kw)

    def node_shift(self, df, node: NodeCall) -> DataFrame:
        off = node.params.get("offset", [("duration", "-30s")])[0]
        off = off[1] if isinstance(off, tuple) else off
        return ops.shift_time(df, off, ts_col="ts")

    def node_time_diff(self, df, node: NodeCall) -> DataFrame:
        alias = node.params.get("as", ["time_diff"])[0]
        return ops.time_diff(df, by=self.group_keys, alias=alias)

    def node_percentile(self, df, node: NodeCall) -> DataFrame:
        field = node.args[0] if node.args else node.params.get(
            "field", node.params.get("fields", [None]))[0]
        if field is None:
            raise ValueError("percentile needs a field")
        df, (field,) = self._materialize_paths(df, [field])
        at = float(self._val(node.params.get("at", [50])[0]))
        alias = node.params.get("as", [f"{field}_percentile"])[0]
        return ops.percentile(df, field, at, alias, by=self._agg_keys())

    def node_top(self, df, node: NodeCall) -> DataFrame:
        field = node.args[0]
        num = int(self._val(node.params.get("num", [node.args[1] if len(node.args) > 1 else 3])[0]))
        return ops.top_k(df, field, num, by=self.group_keys)

    def node_bottom(self, df, node: NodeCall) -> DataFrame:
        field = node.args[0]
        num = int(self._val(node.params.get("num", [node.args[1] if len(node.args) > 1 else 3])[0]))
        return ops.top_k(df, field, num, by=self.group_keys, bottom=True)

    def node_state_change(self, df, node: NodeCall) -> DataFrame:
        return ops.state_change(df, self._state_lambda(node),
                                by=self.group_keys)

    def _state_lambda(self, node: NodeCall):
        src = node.args[0] if node.args else node.params["lambda"][0]
        return truthy(self._lam(src))

    def node_state_count(self, df, node: NodeCall) -> DataFrame:
        alias = node.params.get("as", ["state_count"])[0]
        return ops.state_count(df, self._state_lambda(node),
                               by=self.group_keys, alias=alias)

    def node_state_duration(self, df, node: NodeCall) -> DataFrame:
        alias = node.params.get("as", ["state_duration"])[0]
        return ops.state_duration(df, self._state_lambda(node),
                                  by=self.group_keys, alias=alias)

    def node_collect_unique(self, df, node: NodeCall) -> DataFrame:
        key = node.args[0] if node.args else node.params["fields"][0]
        df, (key,) = self._materialize_paths(df, [key])
        return ops.collect_unique(df, key)

    def node_combine(self, df, node: NodeCall) -> DataFrame:
        other = self.env[node.args[0][1]]
        prefix = node.params.get("prefix", ["c_"])[0]
        keys = self.group_keys
        if not keys:
            # the reference combine is keyless (one stream pairing,
            # esp_combine.erl:55): emulate with a constant key — correct,
            # but a single-partition as-of at scale, so warn like the
            # other global-order fallbacks
            from faxe_spark.operators.common import warn_global_order

            warn_global_order("combine")
            out = ops.combine(df.withColumn("_gk", F.lit(1)),
                              other.withColumn("_gk", F.lit(1)),
                              ["_gk"], prefix=prefix)
            return out.drop("_gk")
        return ops.combine(df, other, keys, prefix=prefix)

    def node_value_emitter(self, df, node: NodeCall) -> DataFrame:
        """Deterministic stand-in for the random emitter (esp_value_emitter
        .erl:26): seeded values so compiled graphs are reproducible."""
        every_ms = parse_duration_ms(self._dur(node.params["every"][0])) \
            if "every" in node.params else 1000
        n = 100
        base = 1_700_000_000_000
        rows = [{"ts": base + i * every_ms, "val": float((i * 37) % 100)}
                for i in range(n)]
        pdf = self.spark.createDataFrame(rows)
        return pdf.withColumn("ts", F.timestamp_millis(F.col("ts")))

    def node_extract_path(self, df, node: NodeCall) -> DataFrame:
        paths = node.params.get("path", list(node.args))
        aliases = node.params.get("as", paths)
        default = self._val(node.params.get("default", [None])[0])
        defaults = [default] * len(paths) if default is not None else None
        return ops.extract_path(df, paths, aliases, defaults)

    def node_array_explode(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", list(node.args))
        aliases = node.params.get("as", None)
        keep_ = node.params.get("keep", ())
        return ops.array_explode(df, fields_, aliases, keep_cols=keep_)

    def node_fields_to_array(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", list(node.args))
        key_name = node.params.get("key_name", ["key"])[0]
        value_name = node.params.get("value_name", ["value"])[0]
        alias = node.params.get("as", ["fields"])[0]
        return ops.fields_to_array(df, fields_, key_name=key_name,
                                   value_name=value_name, alias=alias)

    def node_path_split(self, df, node: NodeCall) -> DataFrame:
        fields_ = node.params.get("fields", list(node.args))
        if not fields_:
            # reference default: split by EVERY root key of the fields
            # object (esp_path_split.erl:22)
            fields_ = [c for c in df.columns if c != "ts"]
        key_alias = self._val(node.params.get(
            "include_as", node.params.get("include_name", ["name"]))[0])
        df, names = self._materialize_paths(df, fields_)
        return ops.path_split(df, names, keep_cols=["ts"],
                              key_alias=str(key_alias))

    def node_jsonsize(self, df, node: NodeCall) -> DataFrame:
        alias = node.params.get("field", ["json_size"])[0]
        return ops.jsonsize(df, alias)

    def node_debug(self, df, node: NodeCall) -> DataFrame:
        return df  # sink pass-through (esp_debug.erl:24)

    def node_log(self, df, node: NodeCall) -> DataFrame:
        return df
