"""Torch replica of the reference NSDP model math, for parity testing.

This re-implements (from the behavioural spec in SURVEY.md §2.3-2.4, NOT by
copying) the reference's point-transformer encoder / cross-attention decoder
pipeline in torch, with attribute names chosen so ``state_dict()`` produces
the same key layout as the published checkpoints.  Tests initialise this
replica randomly, convert its state_dict with
``nsdp_tpu.utils.torch_convert``, and assert the flax model produces the same
outputs — validating both the JAX model semantics and the converter against
the real checkpoint key format.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF


def pairwise_sqdist(a, b):
    # (B,N,C),(B,M,C) -> (B,N,M)
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


def gather_pts(x, idx):
    # x: (B,N,C); idx: (B,S) or (B,S,K)
    shape = idx.shape
    flat = idx.reshape(shape[0], -1)
    out = torch.gather(
        x, 1, flat[..., None].expand(-1, -1, x.shape[-1])
    )
    return out.reshape(*shape, x.shape[-1])


def fps_reference(xyz, npoint):
    """FPS with the CUDA kernel's semantics: start at 0, skip |p|^2<=1e-3."""
    B, N, _ = xyz.shape
    out = torch.zeros(B, npoint, dtype=torch.long)
    for b in range(B):
        # detach: index selection is non-differentiable (the reference's
        # CUDA kernel likewise returns plain indices)
        p = xyz[b].detach().numpy()
        valid = (p**2).sum(-1) > 1e-3
        mind = np.full(N, 1e10)
        sel = [0]
        for _ in range(1, npoint):
            d = ((p - p[sel[-1]]) ** 2).sum(-1)
            mind = np.where(valid, np.minimum(mind, d), mind)
            sel.append(int(np.argmax(np.where(valid, mind, -np.inf))))
        out[b] = torch.tensor(sel)
    return out


def two_mlp(d_in, d):
    return tnn.Sequential(tnn.Linear(d_in, d), tnn.ReLU(), tnn.Linear(d, d))


def vec_attn(q, k, v, pos, gamma):
    # q (B,N,D); k,v,pos (B,N,K,D)
    a = tF.softmax(gamma(q[:, :, None] - k + pos), dim=-2)
    return (a * (v + pos)).sum(-2)


class TB(tnn.Module):
    """Vector self-attention block (local kNN or full)."""

    def __init__(self, d, k, pos_only=False, group_all=False):
        super().__init__()
        self.bn = tnn.BatchNorm1d(d)
        self.fc_delta = two_mlp(3, d)
        self.fc_gamma = two_mlp(d, d)
        self.w_qs = tnn.Linear(d, d, bias=False)
        self.w_ks = tnn.Linear(d, d, bias=False)
        self.w_vs = tnn.Linear(d, d, bias=False)
        self.k, self.pos_only, self.group_all = k, pos_only, group_all

    def forward(self, xyz, feats=None):
        B, n, _ = xyz.shape
        if self.group_all:
            idx = torch.arange(n)[None, None].expand(B, n, n)
        else:
            idx = pairwise_sqdist(xyz, xyz).argsort()[:, :, : self.k]
        nxyz = gather_pts(xyz, idx)
        pos = self.fc_delta(xyz[:, :, None] - nxyz)
        if self.pos_only:
            a = tF.softmax(self.fc_gamma(pos), dim=-2)
            res = (a * pos).sum(-2)
        else:
            res = vec_attn(
                self.w_qs(feats),
                gather_pts(self.w_ks(feats), idx),
                gather_pts(self.w_vs(feats), idx),
                pos,
                self.fc_gamma,
            ) + feats
        return self.bn(res.transpose(1, 2)).transpose(1, 2)


class EW(tnn.Module):
    """Per-point residual MLP with three BatchNorms."""

    def __init__(self, d):
        super().__init__()
        self.conv1 = tnn.Conv1d(d, d, 1)
        self.bn1 = tnn.BatchNorm1d(d)
        self.conv2 = tnn.Conv1d(d, d, 1)
        self.bn2 = tnn.BatchNorm1d(d)
        self.bn3 = tnn.BatchNorm1d(d)

    def forward(self, x):
        h = x.transpose(1, 2)
        y = tF.relu(self.bn2(self.conv2(tF.relu(self.bn1(self.conv1(h))))))
        return self.bn3(h + y).transpose(1, 2)


class TSA(tnn.Module):
    """Attentive set abstraction: FPS centres cross-attend twice."""

    def __init__(self, npoint, nneigh, d):
        super().__init__()
        self.npoint, self.nneigh = npoint, nneigh
        self.bnorm0 = tnn.BatchNorm1d(d)
        self.bnorm1 = tnn.BatchNorm1d(d)
        self.bnorm2 = tnn.BatchNorm1d(d)
        self.bn1 = tnn.BatchNorm1d(d)
        self.conv1 = tnn.Conv1d(d, d, 1)
        self.conv2 = tnn.Conv1d(d, d, 1)
        self.fc_delta1 = two_mlp(3, d)
        self.fc_gamma1 = two_mlp(d, d)
        self.fc_gamma2 = two_mlp(d, d)
        for nm in ("w_qs", "w_ks", "w_vs", "w_qs2", "w_ks2", "w_vs2"):
            setattr(self, nm, tnn.Linear(d, d, bias=False))

    def forward(self, xyz, points):
        B, N, C = xyz.shape
        fidx = fps_reference(xyz, self.npoint)
        # reference detaches the FPS-gathered centre coordinates (new_xyz
        # computed inside torch.no_grad(), encoder/blocks.py:282-285); the
        # neighbour gathers below stay differentiable
        new_xyz = gather_pts(xyz, fidx).detach()
        idx = pairwise_sqdist(new_xyz, xyz).argsort()[:, :, : self.nneigh]

        pos = self.fc_delta1(gather_pts(xyz, idx) - new_xyz[:, :, None])
        r1 = vec_attn(
            gather_pts(self.w_qs(points), fidx),
            gather_pts(self.w_ks(points), idx),
            gather_pts(self.w_vs(points), idx),
            pos,
            self.fc_gamma1,
        )
        h = self.conv2(tF.relu(self.bn1(self.conv1(r1.transpose(1, 2)))))
        r1 = self.bnorm0((r1 + h.transpose(1, 2)).transpose(1, 2)).transpose(1, 2)
        r2 = vec_attn(
            self.w_qs2(r1),
            gather_pts(self.w_ks2(points), idx),
            gather_pts(self.w_vs2(points), idx),
            pos,
            self.fc_gamma2,
        )
        out = self.bnorm1((r1 + r2).transpose(1, 2)).transpose(1, 2)
        out = out + gather_pts(points, fidx)
        return new_xyz, self.bnorm2(out.transpose(1, 2)).transpose(1, 2)


class PNSA(tnn.Module):
    """Maxpool set abstraction (PointNet++ style)."""

    def __init__(self, npoint, nneigh, in_ch, d):
        super().__init__()
        self.npoint, self.nneigh = npoint, nneigh
        self.fc1 = tnn.Linear(in_ch, d)
        self.conv1 = tnn.Conv1d(d, d, 1)
        self.conv2 = tnn.Conv1d(d, d, 1)
        self.bn1 = tnn.BatchNorm1d(d)
        self.bn2 = tnn.BatchNorm1d(d)
        self.bn = tnn.BatchNorm1d(d)

    def forward(self, xyz, points):
        fidx = fps_reference(xyz, self.npoint)
        new_xyz = gather_pts(xyz, fidx)
        points = self.fc1(points)
        ori = gather_pts(points, fidx)
        h = points.transpose(1, 2)
        h = h + tF.relu(self.bn2(self.conv2(tF.relu(self.bn1(self.conv1(h))))))
        points = h.transpose(1, 2)
        idx = pairwise_sqdist(new_xyz, xyz).argsort()[:, :, : self.nneigh]
        pooled = gather_pts(points, idx).max(2)[0]
        out = self.bn((ori + pooled).transpose(1, 2)).transpose(1, 2)
        return new_xyz, out


class TD(tnn.Module):
    def __init__(self, npoint, nneigh, d, sa_type="attentive"):
        super().__init__()
        self.sa = TSA(npoint, nneigh, d) if sa_type == "attentive" else PNSA(
            npoint, nneigh, d, d
        )

    def forward(self, xyz, points):
        return self.sa(xyz, points)


class Encoder(tnn.Module):
    """Point-transformer encoder replica."""

    def __init__(
        self,
        npoints_per_layer,
        nneighbor,
        nneighbor_reduced,
        nfinal_transformers,
        d_transformer,
        d_reduced,
        full_SA=False,
        has_features=False,
        inp_feat_dim=1,
    ):
        super().__init__()
        self.d_reduced, self.d_transformer = d_reduced, d_transformer
        self.has_features = has_features
        self.fc_middle = two_mlp(d_transformer, d_transformer)
        if has_features:
            self.enc_sdf = tnn.Linear(inp_feat_dim, d_reduced)
        self.transformer_begin = TB(
            d_reduced, nneighbor_reduced, pos_only=not has_features
        )
        self.transition_downs = tnn.ModuleList()
        self.transformer_downs = tnn.ModuleList()
        self.elementwise = tnn.ModuleList()
        self.elementwise_extras = tnn.ModuleList()
        if d_reduced != d_transformer:
            self.fc1 = tnn.Linear(d_reduced, d_transformer)
        for i in range(len(npoints_per_layer) - 1):
            old_n, new_n = npoints_per_layer[i], npoints_per_layer[i + 1]
            dim = d_reduced if i == 0 else d_transformer
            self.transition_downs.append(TD(new_n, min(nneighbor, old_n), dim))
            self.elementwise_extras.append(EW(dim))
            self.transformer_downs.append(TB(dim, min(nneighbor, new_n)))
            self.elementwise.append(EW(d_transformer))
        self.final_transformers = tnn.ModuleList(
            TB(d_transformer, 2 * nneighbor, group_all=full_SA)
            for _ in range(nfinal_transformers)
        )
        self.final_elementwise = tnn.ModuleList(
            EW(d_transformer) for _ in range(nfinal_transformers)
        )

    def forward(self, xyz):
        if self.has_features:
            feats = self.enc_sdf(xyz[:, :, 3:])
            xyz = xyz[:, :, :3]
            feats = self.transformer_begin(xyz, feats)
        else:
            feats = self.transformer_begin(xyz)
        for i in range(len(self.transition_downs)):
            xyz, feats = self.transition_downs[i](xyz, feats)
            feats = self.elementwise_extras[i](feats)
            feats = self.transformer_downs[i](xyz, feats)
            if i == 0 and self.d_reduced != self.d_transformer:
                feats = self.fc1(feats)
            feats = self.elementwise[i](feats)
        for tb, ew in zip(self.final_transformers, self.final_elementwise):
            feats = ew(tb(xyz, feats))
        z = self.fc_middle(feats.max(1)[0])
        return {"z": z, "anchors": xyz, "anchor_feats": feats}


class EncoderPNPP(tnn.Module):
    """PointNet++-style ablation encoder replica."""

    def __init__(self, npoints_per_layer, nneighbor, d_transformer,
                 nfinal_transformers, has_features=False, inp_feat_dim=1):
        super().__init__()
        self.has_features = has_features
        self.fc_middle = two_mlp(d_transformer, d_transformer)
        self.fc_begin = two_mlp(
            inp_feat_dim if has_features else 3, d_transformer
        )
        self.transition_downs = tnn.ModuleList()
        self.elementwise = tnn.ModuleList()
        for i in range(len(npoints_per_layer) - 1):
            old_n, new_n = npoints_per_layer[i], npoints_per_layer[i + 1]
            self.transition_downs.append(
                TD(new_n, min(nneighbor, old_n), d_transformer,
                   sa_type="maxpool")
            )
            self.elementwise.append(EW(d_transformer))
        self.final_transformers = tnn.ModuleList(
            TB(d_transformer, -1, group_all=True)
            for _ in range(nfinal_transformers)
        )
        self.final_elementwise = tnn.ModuleList(
            EW(d_transformer) for _ in range(nfinal_transformers)
        )

    def forward(self, xyz):
        if self.has_features:
            feats = self.fc_begin(xyz[:, :, 3:])
            xyz = xyz[:, :, :3]
        else:
            feats = self.fc_begin(xyz)
        for td, ew in zip(self.transition_downs, self.elementwise):
            xyz, feats = td(xyz, feats)
            feats = ew(feats)
        for tb, ew in zip(self.final_transformers, self.final_elementwise):
            feats = ew(tb(xyz, feats))
        z = self.fc_middle(feats.max(1)[0])
        return {"z": z, "anchors": xyz, "anchor_feats": feats}


class InterpDecoder(tnn.Module):
    """Gaussian-kernel interpolation decoder replica."""

    def __init__(self, dim_inp, dim, out_dim=3, hidden_dim=50, n_blocks=5):
        super().__init__()
        self.fc0 = tnn.Linear(dim_inp, dim)
        self.fc1 = tnn.Linear(dim, hidden_dim)
        self.blocks = tnn.ModuleList(RB(hidden_dim) for _ in range(n_blocks))
        self.fc_c = tnn.ModuleList(
            tnn.Linear(dim, hidden_dim) for _ in range(n_blocks)
        )
        self.fc_out = tnn.Linear(hidden_dim, out_dim)
        self.var = 0.2**2

    def forward(self, xyz_q, enc):
        p, fea = enc["anchors"], enc["anchor_feats"]
        dist = -(
            (p.unsqueeze(1).expand(-1, xyz_q.size(1), -1, -1)
             - xyz_q.unsqueeze(2)).norm(dim=3) + 10e-6
        ) ** 2
        w = (dist / self.var).exp()
        w = w / w.sum(dim=2).unsqueeze(-1)
        lat = self.fc0(w @ fea)
        net = self.fc1(tF.relu(lat))
        for blk, fc in zip(self.blocks, self.fc_c):
            net = blk(net + fc(lat))
        return self.fc_out(tF.relu(net))


class CTB(tnn.Module):
    """Cross-attention: queries attend to nearest anchors + global token."""

    def __init__(self, dim_inp, dim, nneigh=7):
        super().__init__()
        self.dim, self.nneigh = dim, nneigh
        self.fc_delta = two_mlp(3, dim)
        self.fc_gamma = two_mlp(dim, dim)
        self.w_k_global = tnn.Linear(dim_inp, dim, bias=False)
        self.w_v_global = tnn.Linear(dim_inp, dim, bias=False)
        self.w_qs = tnn.Linear(dim_inp, dim, bias=False)
        self.w_ks = tnn.Linear(dim_inp, dim, bias=False)
        self.w_vs = tnn.Linear(dim_inp, dim, bias=False)

    def forward(self, xyz_q, lat, xyz, points):
        B, nQ, _ = xyz_q.shape
        k_n = min(self.nneigh, xyz.shape[1])
        idx = pairwise_sqdist(xyz_q, xyz).argsort()[:, :, :k_n]
        q = self.w_qs(lat)[:, None].expand(-1, nQ, -1)
        kg = self.w_k_global(lat)[:, None].expand(-1, nQ, -1)[:, :, None]
        vg = self.w_v_global(lat)[:, None].expand(-1, nQ, -1)[:, :, None]
        k = torch.cat([gather_pts(self.w_ks(points), idx), kg], 2)
        v = torch.cat([gather_pts(self.w_vs(points), idx), vg], 2)
        pos = self.fc_delta(xyz_q[:, :, None] - gather_pts(xyz, idx))
        pos = torch.cat([pos, torch.zeros(B, nQ, 1, self.dim)], 2)
        return vec_attn(q, k, v, pos, self.fc_gamma)


class RB(tnn.Module):
    """FC ResNet block, zero-init second layer."""

    def __init__(self, d):
        super().__init__()
        self.fc_0 = tnn.Linear(d, d)
        self.fc_1 = tnn.Linear(d, d)
        tnn.init.zeros_(self.fc_1.weight)

    def forward(self, x):
        return x + self.fc_1(tF.relu(self.fc_0(tF.relu(x))))


class Decoder(tnn.Module):
    def __init__(self, dim_inp, dim, nneigh=7, hidden_dim=64, n_blocks=5, out_dim=1):
        super().__init__()
        self.n_blocks = n_blocks
        self.ct1 = CTB(dim_inp, dim, nneigh)
        self.init_enc = tnn.Linear(dim, hidden_dim)
        self.blocks = tnn.ModuleList(RB(hidden_dim) for _ in range(n_blocks))
        self.fc_c = tnn.ModuleList(
            tnn.Linear(dim, hidden_dim) for _ in range(n_blocks)
        )
        self.fc_out = tnn.Linear(hidden_dim, out_dim)

    def forward(self, xyz_q, enc):
        lat = self.ct1(xyz_q, enc["z"], enc["anchors"], enc["anchor_feats"])
        net = self.init_enc(lat)
        for blk, fc in zip(self.blocks, self.fc_c):
            net = blk(net + fc(lat))
        return self.fc_out(tF.relu(net))


class DefNet(tnn.Module):
    def __init__(self, enc_kwargs, dec_kwargs, no_input_corr,
                 use_normals=False):
        super().__init__()
        self.no_input_corr = no_input_corr
        self.cond_end = 6 if (no_input_corr and use_normals) else 3
        self.encoder = Encoder(**enc_kwargs)
        self.decoder = Decoder(**dec_kwargs)

    def forward(self, points, inputs):
        cond = (
            inputs[:, :, 0 : self.cond_end]
            if self.no_input_corr
            else inputs
        )
        return self.decoder(points, self.encoder(cond))


class FlowArb(tnn.Module):
    def __init__(self, enc_kwargs_bwd, enc_kwargs_fwd, dec_kwargs):
        super().__init__()
        self.model_canonicalize = DefNet(enc_kwargs_bwd, dec_kwargs, True)
        self.model_deform = DefNet(enc_kwargs_fwd, dec_kwargs, False)

    def forward(self, space_src, surf_src, surf_tgt, mask):
        space_cano = self.model_canonicalize(space_src, surf_src)
        surf_cano = self.model_canonicalize(surf_src, surf_src)
        cond = torch.cat([surf_cano, surf_tgt, mask], -1)
        return self.model_deform(space_cano, cond)
