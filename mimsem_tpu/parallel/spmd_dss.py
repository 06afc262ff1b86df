"""Owner-computes SPMD direct stiffness summation (sharding v2/v3).

The round-1 layout left the DSS to GSPMD, which lowered the 12 static
cube-edge strip exchanges + in-face shifted-slice adds of
ops/local_form.py into ~1400 strip-sized collective-permutes and ~150
all-gathers per SW step (measured ~3.7 MB of collective traffic for a 25 kB
state -- scripts/analyze_collectives.py).  This module replaces that with an
explicit shard_map schedule, the TPU-native analogue of the reference's
VecScatter ghost exchange (src/Topo.cpp:144-154) with the cross-panel
orientation cases resolved at setup (scr/Proc2.py:133-198):

  * the element grid [nf*ney, nex] is tiled over a (Dr, Dc) device mesh --
    Dr contiguous row blocks x Dc contiguous column blocks (the SURVEY 2.6
    (face, fy, fx) product decomposition; Dc == 1 reproduces the v2 1-D
    row-block layout).  Element arrays are stored tile-major via the
    LocalOps el_perm so each device owns one contiguous [R, C] tile;
  * in-tile east-west sums are pure local slicing; the one column pair
    crossing each tile boundary is a nearest-neighbor lax.ppermute of a
    single [R, p]-ish strip along the column mesh axis (always interior to
    a face: face E/W boundaries are cube-edge strips);
  * in-tile north-south sums are local masked slicing; the row pair
    crossing each row-block boundary is a ppermute along the row mesh axis
    of a [C, p]-ish strip, masked by same-face;
  * the 12 cube-edge strip pairs and 8 cube-vertex triples are packed into
    one [24, L] + [8, 3] buffer: each entry is owned by exactly one device,
    everyone contributes owned entries (zeros elsewhere), ONE lax.psum
    replicates the full panel boundary (~24*ne*p values, a few kB), each
    device combines pairs/vertices redundantly and scatters back only its
    owned slots.

Communication per DSS: <= 4 neighbor permutes (strip-sized) + 1 psum
(panel-boundary-sized, INDEPENDENT of the device count).  Everything is
driven by per-device index tables (numpy at setup, selected by
lax.axis_index inside the body), so the traced body is uniform across
devices and vmap-compatible (the 3D model vmaps DSS over levels -- the
level batch then rides the same single psum).

Ordering invariant: the east-west direction completes globally (in-tile +
cross-tile) before any north-south sum starts, so the N/S strips carry
E-W-complete values and the four copies of a 4-tile corner node all
converge to the same total (the 1-D proof in dss0 generalizes).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BIG = np.iinfo(np.int32).max // 2     # out-of-range => take fills 0 / scatter drops


class SpmdDss:
    """Builds and owns the shard_map'ed dss0/dss1 for a LocalOps instance.

    Valid when (nf*ney) % Dr == 0 and nex % Dc == 0 for the device mesh's
    (Dr[, Dc]) shape; the caller falls back to the GSPMD path otherwise.
    """

    def __init__(self, ops, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh
        axes = mesh.axis_names
        self.row_ax = axes[0]
        self.col_ax = axes[1] if len(axes) > 1 else None
        if self.col_ax is None:
            self.Dr, self.Dc = mesh.devices.size, 1
        else:
            self.Dr, self.Dc = mesh.devices.shape
        Dr, Dc = self.Dr, self.Dc
        self.D = D = Dr * Dc
        self.rows = rows = ops.nf * ops.ney
        assert rows % Dr == 0, (rows, Dr)
        assert ops.nex % Dc == 0, (ops.nex, Dc)
        self.R = R = rows // Dr
        self.C = ops.nex // Dc
        p, np1, nex = ops.p, ops.p + 1, ops.nex
        self.K0 = np1 * np1
        self.K1 = 2 * ops.n1loc
        self.periodic = ops.periodic
        self.psum_axes = (self.row_ax,) if self.col_ax is None \
            else (self.row_ax, self.col_ax)

        # ---- north-south row-pair masks (depend on the row block only) ----
        # rows r, r+1 of a block may belong to different faces (no sum)
        face_of = np.arange(rows) // ops.ney if not self.periodic else \
            np.zeros(rows, np.int64)
        ns_int = np.zeros((Dr, max(R - 1, 1)), bool)
        snd_up = np.zeros(Dr, bool)     # my last row pairs with next block's first
        snd_dn = np.zeros(Dr, bool)     # my first row pairs with prev block's last
        for d in range(Dr):
            for r in range(R - 1):
                g = d * R + r
                ns_int[d, r] = face_of[g] == face_of[g + 1]
            g_last = d * R + R - 1
            if g_last + 1 < rows:
                snd_up[d] = face_of[g_last] == face_of[g_last + 1]
            elif self.periodic:
                snd_up[d] = True
            g_first = d * R
            if g_first - 1 >= 0:
                snd_dn[d] = face_of[g_first] == face_of[g_first - 1]
            elif self.periodic:
                snd_dn[d] = True
        self.ns_int = jnp.asarray(ns_int)
        self.snd_up = jnp.asarray(snd_up)
        self.snd_dn = jnp.asarray(snd_dn)
        # neighbor permutes along the row axis (wraparound only for the box)
        self.perm_up = [(d, d + 1) for d in range(Dr - 1)]   # send N-strip fwd
        self.perm_dn = [(d + 1, d) for d in range(Dr - 1)]   # send S-strip back
        if self.periodic and Dr > 1:
            self.perm_up.append((Dr - 1, 0))
            self.perm_dn.append((0, Dr - 1))
        # neighbor permutes along the column axis; every cross-tile column
        # pair is interior to a face, so no masks (except box wraparound,
        # which pairs col nex-1 with col 0 across the seam)
        self.perm_e = [(d, d + 1) for d in range(Dc - 1)]    # send E-strip fwd
        self.perm_w = [(d + 1, d) for d in range(Dc - 1)]    # send W-strip back
        self.ew_wrap = self.periodic and Dc > 1
        if self.ew_wrap:
            self.perm_e.append((Dc - 1, 0))
            self.perm_w.append((0, Dc - 1))

        if not self.periodic and ops.nf > 1:
            self._build_panel_tables()

        spec = P(self.row_ax, None) if self.col_ax is None \
            else P(self.row_ax, self.col_ax)
        self._dss0_sm = jax.shard_map(
            self._dss0_body, mesh=mesh, in_specs=spec, out_specs=spec)
        self._dss1_sm = jax.shard_map(
            self._dss1_body, mesh=mesh, in_specs=spec, out_specs=spec)

    # ------------------------------------------------------------------ tables
    def _strips(self):
        keys = []
        for f in range(self.ops.nf):
            for side in 'EWNS':
                keys.append((f, side))
        return keys

    def _loc(self, el, slot, K):
        """Per-entry (device, local-flat-index) for structural (el, slot)
        under the (Dr, Dc) tile decomposition + tile-major storage."""
        el = np.asarray(el)
        g, c = el // self.ops.nex, el % self.ops.nex
        dr, dc = g // self.R, c // self.C
        d = dr * self.Dc + dc
        lf = ((g - dr * self.R) * self.C + (c - dc * self.C)) * K + slot
        return d, lf

    def _strip0_copies(self, f, side):
        """ALL (el, slot) copies along a 0-form face strip, [L0, 2] each
        (junction nodes have 2 copies; endpoints/interior-of-element 1)."""
        ops = self.ops
        p, np1, ne = ops.p, ops.p + 1, ops.nex
        L0 = ne * p + 1
        el = np.full((L0, 2), -1, np.int64)
        sl = np.full((L0, 2), -1, np.int64)
        for ks in range(L0):
            cnt = 0
            for e in range(ne):
                r = ks - e * p
                if 0 <= r <= p:
                    if side == 'E':
                        ee, ss = f * ne * ne + e * ne + (ne - 1), r * np1 + p
                    elif side == 'W':
                        ee, ss = f * ne * ne + e * ne + 0, r * np1 + 0
                    elif side == 'N':
                        ee, ss = f * ne * ne + (ne - 1) * ne + e, p * np1 + r
                    else:
                        ee, ss = f * ne * ne + 0 * ne + e, 0 * np1 + r
                    el[ks, cnt], sl[ks, cnt] = ee, ss
                    cnt += 1
        return el, sl

    def _build_panel_tables(self):
        ops, D = self.ops, self.D
        topo = ops.topo
        keys = self._strips()
        self.sidx = {k: i for i, k in enumerate(keys)}
        p, ne = ops.p, ops.nex
        L1, L0 = ne * p, ne * p + 1
        self.L1, self.L0 = L1, L0

        # -- 1-form: canonical single copies --------------------------------
        exp1 = np.full((D, len(keys), L1), BIG, np.int64)
        for i, (f, side) in enumerate(keys):
            el, slot = ops._strip1(f, side)
            d, lf = self._loc(el, slot, self.K1)
            exp1[d, i, np.arange(L1)] = lf
        self.exp1 = jnp.asarray(np.minimum(exp1.reshape(D, -1), BIG),
                                jnp.int32)

        # -- 0-form: canonical export, duplicated import --------------------
        exp0 = np.full((D, len(keys), L0), BIG, np.int64)
        imp0 = np.full((D, len(keys), L0, 2), BIG, np.int64)
        for i, (f, side) in enumerate(keys):
            el_c, slot_c = ops._strip0(f, side)
            d, lf = self._loc(el_c, slot_c, self.K0)
            exp0[d, i, np.arange(L0)] = lf
            el2, sl2 = self._strip0_copies(f, side)
            for t in range(L0):
                for c in range(2):
                    if el2[t, c] >= 0:
                        dd, ll = self._loc(el2[t, c], sl2[t, c], self.K0)
                        imp0[dd, i, t, c] = ll
        self.exp0 = jnp.asarray(np.minimum(exp0.reshape(D, -1), BIG), jnp.int32)
        self.imp0 = jnp.asarray(np.minimum(imp0.reshape(D, -1), BIG), jnp.int32)

        # -- vertices: 8 groups x 3 canonical picks -------------------------
        meta = ops.meta
        np1 = ops.p + 1
        vidx = np.full((D, 8, 3), BIG, np.int64)
        gid_of_group = {}
        for g, group in enumerate(meta.verts0):
            for c, (f, cy, cx, iy, ix) in enumerate(group):
                el = f * ne * ne + cy * ne + cx
                slot = iy * np1 + ix
                gid_of_group.setdefault(g, int(topo.e2d0[el, slot]))
                d, lf = self._loc(np.asarray([el]), np.asarray([slot]), self.K0)
                vidx[int(d[0]), g, c] = int(lf[0])
        self.vidx = jnp.asarray(np.minimum(vidx.reshape(D, -1), BIG), jnp.int32)

        # strip-endpoint -> vertex-group assignment
        g_of_gid = {v: k for k, v in gid_of_group.items()}
        endv = np.zeros((len(keys), 2), np.int64)
        for i, (f, side) in enumerate(keys):
            el_c, slot_c = ops._strip0(f, side)
            endv[i, 0] = g_of_gid[int(topo.e2d0[el_c[0], slot_c[0]])]
            endv[i, 1] = g_of_gid[int(topo.e2d0[el_c[-1], slot_c[-1]])]
        self.endv = endv

        # pair lists in strip-index form (trace-time python constants)
        self.pairs1 = [(self.sidx[ka], self.sidx[kb], flip, sgn)
                       for ka, kb, flip, sgn in meta.pairs1]
        self.pairs0 = [(self.sidx[ka], self.sidx[kb], flip)
                       for ka, kb, flip in meta.pairs0]

    # ------------------------------------------------------------------ helpers
    def _flat(self, x):
        """Flatten the last 3 axes [R, C, K] -> [R*C*K]."""
        return x.reshape(*x.shape[:-3], -1)

    def _take(self, flat, idx):
        return jnp.take(flat, idx, axis=-1, mode='fill', fill_value=0.0)

    def _put(self, flat, idx, vals):
        return flat.at[..., idx].set(vals, mode='drop')

    def _dev(self):
        """Flat device id dr*Dc + dc, and the row-block id dr."""
        dr = lax.axis_index(self.row_ax)
        if self.col_ax is None:
            return dr, dr
        return dr * self.Dc + lax.axis_index(self.col_ax), dr

    def _ew_exchange(self, east, west):
        """Exchange tile-boundary strips along the column axis; returns the
        (received-west, received-east) contributions to add at my east/west
        boundaries.  Strips always pair within a face, so no masking -- a
        device with no E (or W) neighbor receives zeros (ppermute default)."""
        recv_w = lax.ppermute(west, self.col_ax, self.perm_w)   # from my east
        recv_e = lax.ppermute(east, self.col_ax, self.perm_e)   # from my west
        return recv_w, recv_e

    # ------------------------------------------------------------------ 0-forms
    def _dss0_body(self, v):
        """v: [..., R, C, np1*np1] local tile (sign-free 0-forms)."""
        ops, R, C = self.ops, self.R, self.C
        p, np1 = ops.p, ops.p + 1
        x = v.reshape(*v.shape[:-3], R, C, np1, np1)
        d, dr = self._dev()

        # in-tile E-W (within rows; fully local)
        s = x[..., :, :-1, :, p] + x[..., :, 1:, :, 0]
        x = x.at[..., :, :-1, :, p].set(s).at[..., :, 1:, :, 0].set(s)
        if self.periodic and self.Dc == 1:
            s = x[..., :, -1, :, p] + x[..., :, 0, :, 0]
            x = x.at[..., :, -1, :, p].set(s).at[..., :, 0, :, 0].set(s)

        # cross-tile E-W column pair via neighbor permutes (completes E-W)
        if self.Dc > 1:
            e_strip = x[..., :, C - 1, :, p]          # [..., R, np1]
            w_strip = x[..., :, 0, :, 0]
            recv_w, recv_e = self._ew_exchange(e_strip, w_strip)
            x = x.at[..., :, C - 1, :, p].add(recv_w)
            x = x.at[..., :, 0, :, 0].add(recv_e)

        # in-face N-S, in-block row pairs (masked by same-face)
        if R > 1:
            m = self.ns_int[dr][:, None, None]
            s = x[..., :-1, :, p, :] + x[..., 1:, :, 0, :]
            x = x.at[..., :-1, :, p, :].set(
                jnp.where(m, s, x[..., :-1, :, p, :]))
            x = x.at[..., 1:, :, 0, :].set(
                jnp.where(m, s, x[..., 1:, :, 0, :]))

        # cross-block row pair via neighbor permutes
        if self.Dr > 1:
            n_strip = x[..., R - 1, :, p, :]          # [..., C, np1]
            s_strip = x[..., 0, :, 0, :]
            recv_s = lax.ppermute(s_strip, self.row_ax, self.perm_dn)
            recv_n = lax.ppermute(n_strip, self.row_ax, self.perm_up)
            x = x.at[..., R - 1, :, p, :].add(
                jnp.where(self.snd_up[dr], recv_s, 0.0))
            x = x.at[..., 0, :, 0, :].add(
                jnp.where(self.snd_dn[dr], recv_n, 0.0))
        elif self.periodic and R > 1:
            # box sharded only in columns: N-S wraparound is in-block
            s = x[..., R - 1, :, p, :] + x[..., 0, :, 0, :]
            x = x.at[..., R - 1, :, p, :].set(s).at[..., 0, :, 0, :].set(s)

        # panel strips + vertices: one psum of the packed boundary
        if not self.periodic and ops.nf > 1:
            flat = self._flat(x.reshape(*v.shape[:-3], R, C, np1 * np1))
            contrib = self._take(flat, self.exp0[d])
            vcontrib = self._take(flat, self.vidx[d])
            tot, vtot = lax.psum((contrib, vcontrib), self.psum_axes)
            T = tot.reshape(*tot.shape[:-1], len(self.sidx), self.L0)
            V = vtot.reshape(*vtot.shape[:-1], 8, 3).sum(-1)     # [..., 8]

            new = [None] * len(self.sidx)
            for ia, ib, flip in self.pairs0:
                a, b = T[..., ia, :], T[..., ib, :]
                bb = b[..., ::-1] if flip else b
                t = a.at[..., 1:-1].add(bb[..., 1:-1])
                tb = t[..., ::-1] if flip else t
                ta = t.at[..., 0].set(V[..., self.endv[ia, 0]])
                ta = ta.at[..., -1].set(V[..., self.endv[ia, 1]])
                tb = tb.at[..., 0].set(V[..., self.endv[ib, 0]])
                tb = tb.at[..., -1].set(V[..., self.endv[ib, 1]])
                new[ia], new[ib] = ta, tb
            NS = jnp.stack(new, axis=-2)              # [..., 24, L0]
            # write both copies of every strip entry this device owns
            vals2 = jnp.broadcast_to(NS[..., None],
                                     (*NS.shape, 2)).reshape(*NS.shape[:-2], -1)
            flat = self._put(flat, self.imp0[d], vals2)
            # vertices: all picks get the group total
            vvals = jnp.broadcast_to(V[..., None],
                                     (*V.shape, 3)).reshape(*V.shape[:-1], -1)
            flat = self._put(flat, self.vidx[d], vvals)
            x = flat.reshape(*v.shape[:-3], R, C, np1, np1)

        return x.reshape(v.shape)

    # ------------------------------------------------------------------ 1-forms
    def _dss1_body(self, v):
        """v: [..., R, C, 2*n1loc] local tile (signed 1-forms)."""
        ops, R, C = self.ops, self.R, self.C
        p, np1 = ops.p, ops.p + 1
        n1loc = ops.n1loc
        vv = v.reshape(*v.shape[:-3], R, C, self.K1)
        vx = vv[..., :n1loc].reshape(*vv.shape[:-1], p, np1)
        vy = vv[..., n1loc:].reshape(*vv.shape[:-1], np1, p)
        d, dr = self._dev()

        # x-family E-W within rows
        s = vx[..., :, :-1, :, p] + vx[..., :, 1:, :, 0]
        vx = vx.at[..., :, :-1, :, p].set(s).at[..., :, 1:, :, 0].set(s)
        if self.periodic and self.Dc == 1:
            s = vx[..., :, -1, :, p] + vx[..., :, 0, :, 0]
            vx = vx.at[..., :, -1, :, p].set(s).at[..., :, 0, :, 0].set(s)

        # x-family cross-tile E-W
        if self.Dc > 1:
            e_strip = vx[..., :, C - 1, :, p]          # [..., R, p]
            w_strip = vx[..., :, 0, :, 0]
            recv_w, recv_e = self._ew_exchange(e_strip, w_strip)
            vx = vx.at[..., :, C - 1, :, p].add(recv_w)
            vx = vx.at[..., :, 0, :, 0].add(recv_e)

        # y-family N-S in-block
        if R > 1:
            m = self.ns_int[dr][:, None, None]
            s = vy[..., :-1, :, p, :] + vy[..., 1:, :, 0, :]
            vy = vy.at[..., :-1, :, p, :].set(
                jnp.where(m, s, vy[..., :-1, :, p, :]))
            vy = vy.at[..., 1:, :, 0, :].set(
                jnp.where(m, s, vy[..., 1:, :, 0, :]))

        # y-family cross-block
        if self.Dr > 1:
            n_strip = vy[..., R - 1, :, p, :]
            s_strip = vy[..., 0, :, 0, :]
            recv_s = lax.ppermute(s_strip, self.row_ax, self.perm_dn)
            recv_n = lax.ppermute(n_strip, self.row_ax, self.perm_up)
            vy = vy.at[..., R - 1, :, p, :].add(
                jnp.where(self.snd_up[dr], recv_s, 0.0))
            vy = vy.at[..., 0, :, 0, :].add(
                jnp.where(self.snd_dn[dr], recv_n, 0.0))
        elif self.periodic and R > 1:
            s = vy[..., R - 1, :, p, :] + vy[..., 0, :, 0, :]
            vy = vy.at[..., R - 1, :, p, :].set(s).at[..., 0, :, 0, :].set(s)

        out = jnp.concatenate(
            [vx.reshape(*vv.shape[:-1], n1loc),
             vy.reshape(*vv.shape[:-1], n1loc)],
            axis=-1)

        # panel strips: one psum of the packed boundary
        if not self.periodic and ops.nf > 1:
            flat = self._flat(out)
            contrib = self._take(flat, self.exp1[d])
            tot = lax.psum(contrib, self.psum_axes)
            T = tot.reshape(*tot.shape[:-1], len(self.sidx), self.L1)
            new = [None] * len(self.sidx)
            for ia, ib, flip, sgn in self.pairs1:
                a, b = T[..., ia, :], T[..., ib, :]
                bb = b[..., ::-1] if flip else b
                t = a + sgn * bb
                new[ia] = t
                new[ib] = sgn * (t[..., ::-1] if flip else t)
            NS = jnp.stack(new, axis=-2).reshape(*T.shape[:-2], -1)
            flat = self._put(flat, self.exp1[d], NS)
            out = flat.reshape(out.shape)

        return out.reshape(v.shape)

    # ------------------------------------------------------------------ API
    def _blocked(self, vl, K):
        """[..., N] flat (tile-major) -> [..., Dr*R, Dc*C... ] 2-axis view the
        shard_map specs partition: [..., Dr, Dc, R, C, K] collapsed to
        [..., Dr*?, ...].  shard_map wants one array dim per spec axis, so we
        expose [Dr, Dc*R*C*K0]-style blocks: dim -2 = row blocks, dim -1 =
        everything within (col blocks x tile x K)."""
        return vl.reshape(*vl.shape[:-1], self.Dr, self.Dc,
                          self.R * self.C * K)

    def dss0(self, vl):
        """vl: [..., ln0] flat local 0-form array (tile-major when Dc > 1)."""
        v = self._blocked(vl, self.K0)
        return self._dss0_sm(v).reshape(vl.shape)

    def dss1(self, vl):
        v = self._blocked(vl, self.K1)
        return self._dss1_sm(v).reshape(vl.shape)
