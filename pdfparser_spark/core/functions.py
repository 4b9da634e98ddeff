"""PDF functions — ISO 32000 §7.10 (all four types).

The function machinery behind /Separation//DeviceN tint transforms,
shadings and transfer functions:

  - Type 0 sampled: multidimensional sample grid, /BitsPerSample
    1..32, /Encode//Decode mapping, multilinear interpolation
  - Type 2 exponential: C0 + x^N (C1 - C0)
  - Type 3 stitching: /Bounds partition + per-subdomain /Encode
  - Type 4 PostScript calculator: the §7.10.5.2 operator set run on a
    bounded stack interpreter (no procedures beyond if/ifelse, no
    access to anything outside the operand stack)

``build_function`` turns a resolved function object (dict, or Stream
for types 0/4) into ``(eval_fn, n_out)`` where ``eval_fn(xs)`` maps a
list of scalar inputs to a list of scalar outputs, domain- and
range-clipped per §7.10.2.  Malformed functions raise ValueError —
callers treat that like any other undecodable resource.

Reference parity: none (the reference never evaluates functions); this
is a strict superset used by the raster tier's /Separation path.
"""

from __future__ import annotations

import math


def _clip(x: float, lo: float, hi: float) -> float:
    return lo if x < lo else (hi if x > hi else x)


def _interp(x: float, x0: float, x1: float, y0: float, y1: float) -> float:
    if x1 == x0:
        return y0
    return y0 + (x - x0) * ((y1 - y0) / (x1 - x0))


# ---------------------------------------------------------------------------
# Type 4: PostScript calculator

_PS_OPS = frozenset(
    "add sub mul div idiv mod neg abs ceiling floor round truncate sqrt sin cos "
    "atan exp ln log cvi cvr dup pop exch copy index roll eq ne gt ge lt le and "
    "or xor not bitshift true false if ifelse".split()
)


def parse_ps_calculator(src: bytes | str) -> list:
    """Tokenize a §7.10.5 calculator program into a nested list (braces
    become sublists).  The outermost braces are required."""
    if isinstance(src, bytes):
        src = src.decode("latin-1")
    toks: list[str] = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "%":  # comment to EOL
            while i < n and src[i] not in "\r\n":
                i += 1
            continue
        if ch in "{}":
            toks.append(ch)
            i += 1
            continue
        j = i
        while j < n and not src[j].isspace() and src[j] not in "{}%":
            j += 1
        toks.append(src[i:j])
        i = j

    pos = 0

    def block() -> list:
        nonlocal pos
        out: list = []
        while pos < len(toks):
            t = toks[pos]
            pos += 1
            if t == "{":
                out.append(block())
            elif t == "}":
                return out
            else:
                try:
                    out.append(int(t))
                except ValueError:
                    try:
                        out.append(float(t))
                    except ValueError:
                        if t not in _PS_OPS:
                            raise ValueError(f"PS calculator: unknown token {t!r}")
                        out.append(t)
        raise ValueError("PS calculator: unbalanced braces")

    if not toks or toks[0] != "{":
        raise ValueError("PS calculator: program must start with '{'")
    pos = 1
    prog = block()
    if pos != len(toks):
        raise ValueError("PS calculator: trailing tokens")
    return prog


def run_ps_calculator(prog: list, inputs: list[float]) -> list[float]:
    """Execute with the inputs on the stack (last input topmost)."""
    st: list = list(inputs)

    def pop_num():
        if not st:
            raise ValueError("PS calculator: stack underflow")
        v = st.pop()
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError("PS calculator: number expected")
        return v

    def pop_any():
        if not st:
            raise ValueError("PS calculator: stack underflow")
        return st.pop()

    def run(block: list) -> None:
        for t in block:
            if isinstance(t, list):
                st.append(t)
            elif isinstance(t, (int, float)):
                st.append(t)
            elif t == "true":
                st.append(True)
            elif t == "false":
                st.append(False)
            elif t in ("add", "sub", "mul", "div"):
                b, a = pop_num(), pop_num()
                if t == "add":
                    st.append(a + b)
                elif t == "sub":
                    st.append(a - b)
                elif t == "mul":
                    st.append(a * b)
                else:
                    if b == 0:
                        raise ValueError("PS calculator: division by zero")
                    st.append(a / b)
            elif t == "idiv":
                b, a = int(pop_num()), int(pop_num())
                if b == 0:
                    raise ValueError("PS calculator: idiv by zero")
                q = abs(a) // abs(b)  # PS idiv truncates toward zero
                st.append(-q if (a < 0) != (b < 0) else q)
            elif t == "mod":
                b, a = int(pop_num()), int(pop_num())
                if b == 0:
                    raise ValueError("PS calculator: mod by zero")
                st.append(int(math.fmod(a, b)))
            elif t == "neg":
                st.append(-pop_num())
            elif t == "abs":
                st.append(abs(pop_num()))
            elif t == "ceiling":
                st.append(float(math.ceil(pop_num())))
            elif t == "floor":
                st.append(float(math.floor(pop_num())))
            elif t == "round":
                v = pop_num()
                st.append(float(math.floor(v + 0.5)))  # PS rounds half up
            elif t == "truncate":
                st.append(float(math.trunc(pop_num())))
            elif t == "sqrt":
                v = pop_num()
                if v < 0:
                    raise ValueError("PS calculator: sqrt of negative")
                st.append(math.sqrt(v))
            elif t == "sin":
                st.append(math.sin(math.radians(pop_num())))
            elif t == "cos":
                st.append(math.cos(math.radians(pop_num())))
            elif t == "atan":
                den, num = pop_num(), pop_num()
                ang = math.degrees(math.atan2(num, den))
                st.append(ang + 360.0 if ang < 0 else ang)
            elif t == "exp":
                b, a = pop_num(), pop_num()
                st.append(a ** b)
            elif t == "ln":
                v = pop_num()
                if v <= 0:
                    raise ValueError("PS calculator: ln of non-positive")
                st.append(math.log(v))
            elif t == "log":
                v = pop_num()
                if v <= 0:
                    raise ValueError("PS calculator: log of non-positive")
                st.append(math.log10(v))
            elif t == "cvi":
                st.append(int(pop_num()))
            elif t == "cvr":
                st.append(float(pop_num()))
            elif t == "dup":
                v = pop_any()
                st.append(v)
                st.append(v)
            elif t == "pop":
                pop_any()
            elif t == "exch":
                b, a = pop_any(), pop_any()
                st.append(b)
                st.append(a)
            elif t == "copy":
                n = int(pop_num())
                if n < 0 or n > len(st):
                    raise ValueError("PS calculator: bad copy count")
                st.extend(st[len(st) - n :])
            elif t == "index":
                n = int(pop_num())
                if n < 0 or n >= len(st):
                    raise ValueError("PS calculator: bad index")
                st.append(st[len(st) - 1 - n])
            elif t == "roll":
                j, n = int(pop_num()), int(pop_num())
                if n < 0 or n > len(st):
                    raise ValueError("PS calculator: bad roll count")
                if n:
                    j %= n
                    if j:
                        part = st[len(st) - n :]
                        del st[len(st) - n :]
                        st.extend(part[-j:] + part[:-j])
            elif t in ("eq", "ne", "gt", "ge", "lt", "le"):
                b, a = pop_any(), pop_any()
                st.append(
                    {"eq": a == b, "ne": a != b, "gt": a > b,
                     "ge": a >= b, "lt": a < b, "le": a <= b}[t]
                )
            elif t in ("and", "or", "xor"):
                b, a = pop_any(), pop_any()
                if isinstance(a, bool) and isinstance(b, bool):
                    st.append({"and": a and b, "or": a or b, "xor": a != b}[t])
                else:
                    ai, bi = int(a), int(b)
                    st.append({"and": ai & bi, "or": ai | bi, "xor": ai ^ bi}[t])
            elif t == "not":
                v = pop_any()
                st.append((not v) if isinstance(v, bool) else ~int(v))
            elif t == "bitshift":
                s, v = int(pop_num()), int(pop_num())
                st.append(v << s if s >= 0 else v >> (-s))
            elif t == "if":
                proc = pop_any()
                cond = pop_any()
                if not isinstance(proc, list) or not isinstance(cond, bool):
                    raise ValueError("PS calculator: if expects bool + procedure")
                if cond:
                    run(proc)
            elif t == "ifelse":
                p2, p1 = pop_any(), pop_any()
                cond = pop_any()
                if (not isinstance(p1, list) or not isinstance(p2, list)
                        or not isinstance(cond, bool)):
                    raise ValueError("PS calculator: ifelse expects bool + 2 procedures")
                run(p1 if cond else p2)
            else:  # pragma: no cover — parse already rejects unknowns
                raise ValueError(f"PS calculator: unknown op {t!r}")
            if len(st) > 100:
                raise ValueError("PS calculator: stack limit exceeded")

    run(prog)
    out = []
    for v in st:
        if isinstance(v, bool) or isinstance(v, list):
            raise ValueError("PS calculator: non-numeric result")
        out.append(float(v))
    return out


# ---------------------------------------------------------------------------
# Type 0 sampled

def _read_samples(data: bytes, count: int, bps: int) -> list[int]:
    if bps in (8, 16, 24, 32):
        nbytes = bps // 8
        if len(data) < count * nbytes:
            raise ValueError("sampled function: sample data too short")
        return [
            int.from_bytes(data[i * nbytes : (i + 1) * nbytes], "big")
            for i in range(count)
        ]
    if bps in (1, 2, 4):
        per = 8 // bps
        out = []
        for i in range(count):
            byte = data[i // per] if i // per < len(data) else None
            if byte is None:
                raise ValueError("sampled function: sample data too short")
            shift = 8 - bps * (i % per + 1)
            out.append((byte >> shift) & ((1 << bps) - 1))
        return out
    if bps == 12:
        out = []
        for i in range(count):
            bit = i * 12
            byte, off = bit // 8, bit % 8
            if byte + 1 >= len(data):
                raise ValueError("sampled function: sample data too short")
            chunk = (data[byte] << 16) | (data[byte + 1] << 8) | (
                data[byte + 2] if byte + 2 < len(data) else 0
            )
            out.append((chunk >> (12 - off)) & 0xFFF)
        return out
    raise ValueError(f"sampled function: bad BitsPerSample {bps}")


def _eval_sampled(spec: dict, xs: list[float]) -> list[float]:
    size = spec["size"]
    m = len(size)
    if len(xs) != m:
        raise ValueError("sampled function: arity mismatch")
    domain, rng = spec["domain"], spec["range"]
    n = len(rng) // 2
    encode = spec["encode"] or [v for s in size for v in (0, s - 1)]
    decode = spec["decode"] or list(rng)
    maxs = (1 << spec["bps"]) - 1
    # encode each input to the sample grid
    coords = []
    for i, x in enumerate(xs):
        x = _clip(x, domain[2 * i], domain[2 * i + 1])
        e = _interp(x, domain[2 * i], domain[2 * i + 1], encode[2 * i], encode[2 * i + 1])
        coords.append(_clip(e, 0, size[i] - 1))
    samples = spec["samples"]

    def sample_at(idx: list[int]) -> list[float]:
        flat = 0
        stride = 1
        for i in range(m):  # first input dimension varies fastest (§7.10.3)
            flat += idx[i] * stride
            stride *= size[i]
        raw = samples[flat * n : flat * n + n]
        return [
            _interp(r, 0, maxs, decode[2 * j], decode[2 * j + 1])
            for j, r in enumerate(raw)
        ]

    # multilinear interpolation over the 2^m corner cube
    base = [int(math.floor(c)) for c in coords]
    base = [min(b, size[i] - 1) for i, b in enumerate(base)]
    frac = [coords[i] - base[i] for i in range(m)]
    out = [0.0] * n
    for corner in range(1 << m):
        w = 1.0
        idx = []
        for i in range(m):
            if corner >> i & 1:
                hi = min(base[i] + 1, size[i] - 1)
                idx.append(hi)
                w *= frac[i]
            else:
                idx.append(base[i])
                w *= 1.0 - frac[i]
        if w == 0.0:
            continue
        vals = sample_at(idx)
        for j in range(n):
            out[j] += w * vals[j]
    return [_clip(out[j], rng[2 * j], rng[2 * j + 1]) for j in range(n)]


# ---------------------------------------------------------------------------
# builder

def build_function(obj, resolve_fn=None):
    """Resolved function object -> (eval_fn, n_outputs).  ``obj`` is a
    dict (type 2/3) or a Stream-like with .attrs/.data/.raw (type 0/4);
    ``resolve_fn`` dereferences indirect values (identity by default)."""
    res = resolve_fn or (lambda v: v)
    attrs = getattr(obj, "attrs", obj)
    if not isinstance(attrs, dict):
        raise ValueError("function: not a dict or stream")
    ftype = res(attrs.get("FunctionType"))
    domain = [float(res(v)) for v in (res(attrs.get("Domain")) or [])]
    if not domain or len(domain) % 2:
        raise ValueError("function: missing /Domain")

    def clip_domain(xs: list[float]) -> list[float]:
        return [
            _clip(x, domain[2 * i], domain[2 * i + 1]) for i, x in enumerate(xs)
        ]

    if ftype == 2:
        c0 = [float(res(v)) for v in (res(attrs.get("C0")) or [0.0])]
        c1 = [float(res(v)) for v in (res(attrs.get("C1")) or [1.0])]
        nexp = float(res(attrs.get("N", 1)))
        if len(c0) != len(c1):
            raise ValueError("function: C0/C1 arity mismatch")

        def f2(xs: list[float]) -> list[float]:
            (x,) = clip_domain(xs)
            if x < 0 and not float(nexp).is_integer():
                # Python would return a complex number here; keep the
                # module's ValueError contract instead (ADVICE r04)
                raise ValueError("function: negative base with fractional /N")
            xn = x ** nexp
            return [a + xn * (b - a) for a, b in zip(c0, c1)]

        return f2, len(c0)

    if ftype == 3:
        funcs = [build_function(res(f), res) for f in res(attrs.get("Functions")) or []]
        bounds = [float(res(v)) for v in (res(attrs.get("Bounds")) or [])]
        encode = [float(res(v)) for v in (res(attrs.get("Encode")) or [])]
        k = len(funcs)
        if k == 0 or len(bounds) != k - 1 or len(encode) != 2 * k:
            raise ValueError("function: bad stitching structure")
        n_out = funcs[0][1]
        d0, d1 = domain[0], domain[1]

        def f3(xs: list[float]) -> list[float]:
            (x,) = clip_domain(xs)
            i = 0
            while i < len(bounds) and x >= bounds[i]:
                i += 1
            lo = d0 if i == 0 else bounds[i - 1]
            hi = d1 if i == k - 1 else bounds[i]
            e = _interp(x, lo, hi, encode[2 * i], encode[2 * i + 1])
            return funcs[i][0]([e])

        return f3, n_out

    if ftype == 4:
        data = getattr(obj, "data", None)
        if data is None:
            data = getattr(obj, "raw", None)
        if data is None:
            raise ValueError("function: type 4 requires a stream body")
        prog = parse_ps_calculator(data)
        rng = [float(res(v)) for v in (res(attrs.get("Range")) or [])]
        if not rng or len(rng) % 2:
            raise ValueError("function: type 4 requires /Range")
        n_out = len(rng) // 2

        def f4(xs: list[float]) -> list[float]:
            out = run_ps_calculator(prog, clip_domain(xs))
            if len(out) != n_out:
                raise ValueError("PS calculator: wrong result arity")
            return [
                _clip(v, rng[2 * j], rng[2 * j + 1]) for j, v in enumerate(out)
            ]

        return f4, n_out

    if ftype == 0:
        data = getattr(obj, "data", None)
        if data is None:
            data = getattr(obj, "raw", None)
        if data is None:
            raise ValueError("function: type 0 requires a stream body")
        rng = [float(res(v)) for v in (res(attrs.get("Range")) or [])]
        size = [int(res(v)) for v in (res(attrs.get("Size")) or [])]
        bps = int(res(attrs.get("BitsPerSample", 0)))
        if not rng or len(rng) % 2 or not size or any(s < 1 for s in size):
            raise ValueError("function: bad sampled structure")
        n_out = len(rng) // 2
        count = n_out
        for s in size:
            count *= s
        enc = res(attrs.get("Encode"))
        dec = res(attrs.get("Decode"))
        spec = {
            "size": size,
            "bps": bps,
            "domain": domain,
            "range": rng,
            "encode": [float(res(v)) for v in enc] if enc else None,
            "decode": [float(res(v)) for v in dec] if dec else None,
            "samples": _read_samples(bytes(data), count, bps),
        }

        def f0(xs: list[float]) -> list[float]:
            return _eval_sampled(spec, xs)

        return f0, n_out

    raise ValueError(f"function: unsupported FunctionType {ftype!r}")
