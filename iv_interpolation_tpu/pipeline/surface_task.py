"""Surface-fitting pipeline task: interpolated option rows -> fitted vol
surfaces with arbitrage diagnostics.

New capability beyond the reference (its IV handling stopped at 1-D time
interpolation): groups interpolated rows by underlying, builds per-expiry
smiles from the latest snapshot, fits the batched surface engine, and
stores the evaluated grid + diagnostics.

Symbol convention follows the reference's data
(``btc-20mar23-24500-c``, main.py:177-183): underlying-expiry-strike-cp.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from iv_interpolation_tpu.pipeline import storage as st
from iv_interpolation_tpu.surface.surface import fit_eval_surface

SURFACES = "vol_surfaces"


def parse_symbol(symbol: str):
    """'btc-20mar23-24500-c' -> (underlying, expiry_str, strike, is_call)."""
    parts = symbol.split("-")
    if len(parts) < 4:
        return None
    try:
        strike = float(parts[-2])
    except ValueError:
        return None
    return parts[0], "-".join(parts[1:-2]), strike, parts[-1].lower() == "c"


def build_chains(df: pd.DataFrame, min_strikes: int = 4):
    """Latest-snapshot chains per (underlying, expiry): log-moneyness and
    iv arrays sorted by strike. Returns list of dicts.

    Quotes without a usable ``iv`` fall back to Black-Scholes inversion of
    ``mark_price`` (batched Newton, ``ops.black_scholes.implied_vol``) —
    the reference carried both columns but could only consume iv."""
    rows = []
    invert = []  # quotes needing price->iv inversion
    for symbol, sub in df.groupby("symbol"):
        parsed = parse_symbol(symbol)
        if parsed is None:
            continue
        und, exp, strike, is_call = parsed
        last = sub.sort_values("date").iloc[-1]
        rec = dict(underlying=und, expiry=exp, strike=strike,
                   S=float(last["underlying_price"]),
                   T=float(last["time_to_maturity"]))
        if np.isfinite(last["iv"]) and last["iv"] > 0:
            rec["iv"] = float(last["iv"])
            rows.append(rec)
        elif ("mark_price" in sub.columns
              and np.isfinite(last.get("mark_price", np.nan))
              and last["mark_price"] > 0):
            rec["price"] = float(last["mark_price"])
            rec["is_call"] = is_call
            rec["rate"] = float(last.get("interest_rate", 0.0) or 0.0)
            invert.append(rec)
    if invert:
        from iv_interpolation_tpu.ops.black_scholes import implied_vol
        price = jnp.asarray([r["price"] for r in invert])
        S = jnp.asarray([r["S"] for r in invert])
        K = jnp.asarray([r["strike"] for r in invert])
        T = jnp.asarray([max(r["T"], 1e-6) for r in invert])
        rt = jnp.asarray([r["rate"] for r in invert])
        is_call = jnp.asarray([r["is_call"] for r in invert])
        ivs = np.asarray(implied_vol(price, S, K, T, rt, is_call))
        for rec, iv_ in zip(invert, ivs):
            if np.isfinite(iv_) and 1e-4 < iv_ < 4.9:
                rec["iv"] = float(iv_)
                rows.append(rec)
    if not rows:
        return []
    frame = pd.DataFrame(rows)
    chains = []
    for (und, exp), grp in frame.groupby(["underlying", "expiry"]):
        grp = (grp.groupby("strike", as_index=False)
               .agg({"iv": "mean", "S": "mean", "T": "mean"})
               .sort_values("strike"))
        if len(grp) < min_strikes:
            continue
        k = np.log(grp["strike"].to_numpy() / grp["S"].to_numpy())
        chains.append(dict(underlying=und, expiry=exp, k=k,
                           iv=grp["iv"].to_numpy(),
                           T=float(grp["T"].mean())))
    return chains


def _fit_rbf_surfaces(k, iv, T, quote_mask, scfg, dev=None):
    """Scattered RBF surfaces over all (k, T) quotes — the WHOLE shape
    bucket as one batched fit (BASELINE.json config #4), evaluated on
    the same (E, grid) layout as the slice-wise methods so downstream
    handling is uniform.

    ``surface.rbf_butterfly_penalty`` / ``rbf_calendar_penalty`` > 0
    switch to the no-arbitrage penalty-smoothing solver
    (``ops.rbf.fit_rbf_arbfree``), with padded quotes weight-0 in the
    data term; at 0 the plain interpolating/smoothing fit is used (all
    quotes, matching the round-1 behavior). Flags are always the
    pipeline's post-hoc finite-difference diagnostics on the eval grid.
    Returns dict of (B, ...) arrays incl. a quote-masked ``fit_rmse``.
    """
    from iv_interpolation_tpu.ops.rbf import (fit_eval_rbf_arbfree_batched,
                                              fit_eval_rbf_batched)
    from iv_interpolation_tpu.surface.arbitrage import butterfly_g_fd

    dev = dev or jnp.asarray  # mesh placement hook (run_surface_fit)

    B, E, n = k.shape
    m = scfg.grid_strikes
    pts = np.stack([k.reshape(B, E * n),
                    np.repeat(T, n, axis=-1)], axis=-1)      # (B, E n, 2)
    vals = (iv ** 2 * T[..., None]).reshape(B, E * n)
    lo = k[:, :, 0].max(axis=1)
    hi = k[:, :, -1].min(axis=1)
    kg_row = lo[:, None] + (hi - lo)[:, None] * np.linspace(0.0, 1.0, m)
    k_grid = np.broadcast_to(kg_row[:, None, :], (B, E, m))
    # grid queries first, the data sites after — one eval pass serves
    # both the surface grid and the fit_rmse statistic
    query = np.concatenate([
        np.stack([k_grid.reshape(B, E * m),
                  np.repeat(T, m, axis=-1)], axis=-1),
        pts,
    ], axis=1)

    penalized = (scfg.rbf_butterfly_penalty > 0.0
                 or scfg.rbf_calendar_penalty > 0.0)
    if penalized:
        w_eval, _, _ = fit_eval_rbf_arbfree_batched(
            dev(pts), dev(vals), dev(query),
            weights=dev(quote_mask.reshape(B, E * n).astype(vals.dtype)),
            smoothing=scfg.rbf_smoothing, kernel=scfg.rbf_kernel,
            butterfly_weight=scfg.rbf_butterfly_penalty,
            calendar_weight=scfg.rbf_calendar_penalty,
            n_iters=scfg.rbf_penalty_iters,
            n_centers=scfg.rbf_centers)
    else:
        w_eval = fit_eval_rbf_batched(
            dev(pts), dev(vals), dev(query),
            smoothing=scfg.rbf_smoothing, kernel=scfg.rbf_kernel)
    w_grid = w_eval[:, :E * m].reshape(B, E, m)
    w_data = w_eval[:, E * m:]
    qm = jnp.asarray(quote_mask.reshape(B, E * n))
    n_real = jnp.maximum(qm.sum(axis=-1), 1)
    fit_rmse = jnp.sqrt(
        jnp.sum(jnp.where(qm, (w_data - jnp.asarray(vals)) ** 2, 0.0),
                axis=-1) / n_real)
    k_grid = jnp.asarray(k_grid)
    g = butterfly_g_fd(k_grid, w_grid)
    iv_grid = jnp.sqrt(jnp.maximum(w_grid, 0.0)
                       / jnp.maximum(jnp.asarray(T)[..., None], 1e-12))
    return {
        "k_grid": k_grid,
        "w_grid": w_grid,
        "iv_grid": iv_grid,
        "g": g,
        "butterfly_ok": jnp.all(g >= -1e-10, axis=(1, 2)),
        "calendar_ok": jnp.all(
            w_grid[:, 1:] - w_grid[:, :-1] >= -1e-12, axis=(1, 2)),
        "fit_rmse": fit_rmse,
    }


def pack_chain_group(group, E_pad: int, n_pad: int, dtype=np.float64):
    """Pad a list of ``(underlying, T-sorted slices)`` chains into one
    dense ``(B, E_pad, n_pad)`` batch: strike axes extend strictly
    monotonically, padded expiry slots repeat the last slice at
    epsilon-larger T (maturities stay strictly ascending), and
    ``quote_mask`` marks the real quotes. ONE definition shared by
    ``run_surface_fit`` and ``serve.build_session`` (round-4 review:
    the serving copy had drifted — no quote_mask, a dead 0.5 iv fill).

    Returns ``(k, iv, T, E_real, quote_mask)``.
    """
    B = len(group)
    k = np.zeros((B, E_pad, n_pad), dtype)
    iv = np.zeros((B, E_pad, n_pad), dtype)
    T = np.zeros((B, E_pad), dtype)
    E_real = np.zeros(B, np.int64)
    quote_mask = np.zeros((B, E_pad, n_pad), bool)
    for b, (_und, slices) in enumerate(group):
        E_real[b] = len(slices)
        for e in range(E_pad):
            c = slices[min(e, len(slices) - 1)]
            m = len(c["k"])
            k[b, e, :m] = c["k"]
            iv[b, e, :m] = c["iv"]
            quote_mask[b, e, :m] = e < len(slices)
            if m < n_pad:
                step = (c["k"][-1] - c["k"][0]) / max(m - 1, 1) or 1e-3
                k[b, e, m:] = c["k"][-1] + step * np.arange(
                    1, n_pad - m + 1)
                iv[b, e, m:] = c["iv"][-1]
            T[b, e] = c["T"] + max(0, e - (len(slices) - 1)) * 1e-3
    return k, iv, T, E_real, quote_mask


def run_surface_fit(config, store, limit: Optional[int] = None,
                    method: Optional[str] = None) -> dict:
    """Fit one surface per underlying from interpolated data and persist
    the evaluated grid + diagnostics.

    ``surface.smile_method`` selects cubic_spline / smoothing_spline /
    svi / essvi / sabr / rbf / ah; ``surface.lm_max_iters`` bounds LM
    calibration; ``surface.butterfly_penalty`` adds the no-arb hinge to
    SVI fits; ``surface.spline_bc`` picks the cubic boundary condition;
    ``surface.rbf_kernel`` / ``surface.rbf_smoothing`` shape the RBF
    path; ``surface.compute_local_vol`` persists Dupire local vol and
    risk-neutral density columns alongside the grid.
    """
    scfg = config.surface
    method = method or scfg.smile_method
    df = store.read(st.INTERPOLATED)
    if df.empty:
        return {"surfaces": 0, "reason": "no interpolated data"}
    chains = build_chains(df)
    if limit:
        chains = chains[:limit]
    if not chains:
        return {"surfaces": 0, "reason": "no usable chains"}

    by_und = {}
    for c in chains:
        by_und.setdefault(c["underlying"], []).append(c)

    # shape-bucket the underlyings: (E_pad, n_pad) chosen from a geometric
    # schedule so repeated runs hit a small fixed set of compiled shapes,
    # and underlyings sharing a bucket fit as ONE batch (was: one
    # compile + one dispatch per underlying; see ROADMAP #1)
    def _pow2_at_least(x, lo):
        b = lo
        while b < x:
            b *= 2
        return b

    prepared = {}
    for und, slices in by_und.items():
        slices = sorted(slices, key=lambda c: c["T"])
        E = max(len(slices), 2)  # surface needs >= 2 expiries
        n = max(len(c["k"]) for c in slices)
        shape = (_pow2_at_least(E, 2), _pow2_at_least(n, 8))
        prepared.setdefault(shape, []).append((und, slices))

    # surface batches shard their underlying dim over the pipeline mesh
    # (same layout as PipelineRunner; transparent single-device
    # fallback). Batches pad to a mesh multiple with quote_mask-False
    # rows so every shard is equal; padded fits are dropped on unpack.
    from iv_interpolation_tpu.parallel.mesh import (pad_to_multiple,
                                                    pipeline_mesh,
                                                    shard_rows)
    mesh = pipeline_mesh(config.processing.mesh_shape,
                         config.processing.mesh_axis_names)
    n_mesh = mesh.shape[mesh.axis_names[0]] if mesh is not None else 1

    def dev(a):
        return shard_rows(mesh, jnp.asarray(a))

    out_frames = []
    n_fit = 0
    for (E_pad, n_pad), group in sorted(prepared.items()):
        B = len(group)
        # real-quote mask: padded strikes and duplicated expiry slices
        # must not enter the fit_rmse statistic
        k, iv, T, E_real, quote_mask = pack_chain_group(group, E_pad,
                                                        n_pad)
        if n_mesh > 1:
            B_fit = pad_to_multiple(B, n_mesh)
            if B_fit != B:
                pads = B_fit - B
                k = np.concatenate([k, np.repeat(k[:1], pads, 0)])
                iv = np.concatenate([iv, np.repeat(iv[:1], pads, 0)])
                T = np.concatenate([T, np.repeat(T[:1], pads, 0)])
                quote_mask = np.concatenate(
                    [quote_mask,
                     np.zeros((pads,) + quote_mask.shape[1:], bool)])
        if method == "rbf":
            res_all = _fit_rbf_surfaces(k, iv, T, quote_mask, scfg,
                                        dev=dev)
            keys = ["k_grid", "w_grid", "iv_grid",
                    "butterfly_ok", "calendar_ok", "fit_rmse"]
            if scfg.compute_local_vol:
                # RBF surfaces support the same Dupire extraction as the
                # slice-wise methods (the promise of compute_local_vol
                # is method-agnostic); cells without a real local vol
                # persist NaN, like everywhere else
                from iv_interpolation_tpu.surface.localvol import (
                    _backward_dwdT, risk_neutral_density)
                g_ = res_all["g"]
                dwdT = _backward_dwdT(res_all["w_grid"],
                                      jnp.asarray(T), 1e-10)
                lv = dwdT / jnp.maximum(g_, 1e-10)
                valid = (g_ > 1e-10) & (dwdT >= 0.0)
                res_all = {
                    **res_all,
                    "local_vol": jnp.where(
                        valid, jnp.sqrt(jnp.maximum(lv, 0.0)), jnp.nan),
                    "density": jnp.where(
                        res_all["w_grid"] > 0.0,
                        risk_neutral_density(res_all["k_grid"],
                                             res_all["w_grid"], g_),
                        jnp.nan),
                }
                keys += ["local_vol", "density"]
            results = [
                {key: res_all[key][b:b + 1] for key in keys}
                for b in range(B)
            ]
        elif method == "ah":
            # Andreasen-Huge one-step surfaces: arbitrage-free BY
            # CONSTRUCTION (ops.andreasen_huge) — same output contract
            # as fit_eval_surface, on the method's own dense PDE grid
            from iv_interpolation_tpu.ops.andreasen_huge import (
                fit_eval_ah_surface)
            res_all = fit_eval_ah_surface(
                dev(k), dev(iv), dev(T),
                n_grid=scfg.ah_grid, n_iters=scfg.ah_iters,
                quote_mask=dev(quote_mask))
            keys = ["k_grid", "w_grid", "iv_grid",
                    "butterfly_ok", "calendar_ok", "fit_rmse"]
            if scfg.compute_local_vol:
                # the AH model's local vol is its own calibration
                # product (exact, no Dupire extraction; already in the
                # fused output). Its 'g' is the STRIKE-space density
                # d2C/dK2; every other method persists the
                # LOG-MONEYNESS Breeden-Litzenberger density, so convert
                # measures (p(k) = K * d2C/dK2, K = e^k on the unit
                # forward) before writing the shared 'density' column.
                # The two boundary-condition columns carry no PDE row
                # (g padded with 0 there) -> persist NaN, not a
                # fabricated zero density (round-3 advisor finding).
                p_k = jnp.exp(res_all["k_grid"]) * res_all["g"]
                interior = jnp.zeros_like(p_k, bool).at[..., 1:-1].set(True)
                res_all = {**res_all,
                           "density": jnp.where(interior, p_k, jnp.nan)}
                keys += ["local_vol", "density"]
            results = [
                {key: res_all[key][b:b + 1] for key in keys}
                for b in range(B)
            ]
        else:
            res_all = fit_eval_surface(
                dev(k), dev(iv), dev(T),
                method=method, n_grid=scfg.grid_strikes,
                svi_iters=scfg.lm_max_iters,
                svi_butterfly_penalty=scfg.butterfly_penalty,
                svi_weighting=scfg.svi_weighting,
                # auto (None): unroll only on TPU — the unrolled LM is a
                # dispatch-floor workaround, and on CPU its ~50x bigger
                # executable was implicated in an LLVM-JIT segfault late
                # in full-suite runs
                svi_unroll=(scfg.svi_unroll if scfg.svi_unroll is not None
                            else jax.default_backend() == "tpu"),
                smoothing_lam=scfg.smoothing_lam,
                spline_bc=scfg.spline_bc,
                quote_mask=dev(quote_mask))
            keys = ["k_grid", "w_grid", "iv_grid",
                    "butterfly_ok", "calendar_ok", "fit_rmse"]
            if scfg.compute_local_vol:
                from iv_interpolation_tpu.surface.localvol import (
                    local_vol_surface)
                lv = local_vol_surface(res_all)
                # cells where g <= 0 or dw/dT < 0 hold eps-clamped
                # garbage (~1e10x real values); persist NaN there so no
                # downstream consumer mistakes them for real local vols.
                # density is masked where the w-clamp would fabricate
                # ~1e5-scale spikes from w <= 0 wing cells (negative
                # density from g < 0 is a REAL arbitrage signal — kept)
                lv["local_vol"] = jnp.where(
                    lv["local_vol_valid"], lv["local_vol"], jnp.nan)
                lv["density"] = jnp.where(
                    res_all["w_grid"] > 0.0, lv["density"], jnp.nan)
                res_all = {**res_all, **lv}
                keys += ["local_vol", "density"]
            results = [
                {key: res_all[key][b:b + 1] for key in keys}
                for b in range(B)
            ]
        for b, (und, slices) in enumerate(group):
            res = results[b]
            n_fit += 1
            E_use = int(E_real[b])
            w = np.asarray(res["w_grid"][0])[:E_use]
            kg = np.asarray(res["k_grid"][0])[:E_use]
            ivg = np.asarray(res["iv_grid"][0])[:E_use]
            Ts = np.repeat(T[b, :E_use], w.shape[-1])
            sdf = pd.DataFrame({
                "underlying": und,
                "expiry_t": Ts,
                "log_moneyness": kg.ravel(),
                "total_variance": w.ravel(),
                "iv": ivg.ravel(),
            })
            if "local_vol" in res:
                sdf["local_vol"] = np.asarray(
                    res["local_vol"][0])[:E_use].ravel()
                sdf["density"] = np.asarray(
                    res["density"][0])[:E_use].ravel()
            sdf["butterfly_ok"] = bool(res["butterfly_ok"][0])
            sdf["calendar_ok"] = bool(res["calendar_ok"][0])
            if "fit_rmse" in res:
                sdf["fit_rmse"] = float(res["fit_rmse"][0])
            out_frames.append(sdf)

    result = pd.concat(out_frames, ignore_index=True)
    store.write(SURFACES, result,
                upsert_keys=["underlying", "expiry_t", "log_moneyness"])
    return {
        "surfaces": n_fit,
        "grid_rows": len(result),
        "butterfly_ok": int(result.groupby("underlying")["butterfly_ok"]
                            .first().sum()),
        "calendar_ok": int(result.groupby("underlying")["calendar_ok"]
                           .first().sum()),
        "method": method,
    }
