"""Label-space-unifying bipartite GNN in Flax.

Reference: lib/models/graph_attention_network.py (Learnable_Topology_BGNN,
:866-1350) and lib/models/ltbgnn_direct_learn.py (Learnable_Topology_BGNN_adj,
:180-640 — the variant named in configs/ltbgnn_7_datasets_snp.json).

Graph = (Σ dataset class nodes ∥ M unified class nodes). Two adjacency modes:
  * 'cosine' — linear_adj features → L2-normalize → cosine similarity,
    masked to the dataset↔unified bipartite blocks, with softmax(τ=0.07)
    applied per-dataset over the unified columns
    (graph_attention_network.py:1106-1158);
  * 'direct' — a learnable (total_cats, M) adjacency parameter, softmaxed
    per-dataset and embedded symmetrically (ltbgnn_direct_learn.py:495-554).

Both feed 4 GCN/GSAGE layers with dropout, then `linear1` emits the unified
prototypes. Bipartite outputs per dataset: a max-masked (or externally
supplied UOT-discrete) graph and/or the softmax graph
(sep_bipartite_graphs, graph_attention_network.py:1041-1088;
ltbgnn_direct_learn.py:365-430). The UOT discrete matching itself is in
mds_tpu.ops.uot_match (host-side, stage boundary only) with β-EMA state held
by the trainer — the reference hides both inside module attributes
(`self.uot_bi`, `self.beta`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.registry import MODELS

Dtype = Any


def _uniform_init(scale_from_out: bool = True):
    """torch GraphConvolution reset_parameters: U(−1/√out, 1/√out)
    (lib/module/module_helper.py:768-772)."""

    def init(key, shape, dtype=jnp.float32):
        stdv = 1.0 / jnp.sqrt(shape[-1])
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


class GCNLayer(nn.Module):
    """x' = tanh(adj @ (x W) + b + x) (module_helper.py:755-780 + GCN
    residual graph_attention_network.py:13-25)."""

    features: int

    @nn.compact
    def __call__(self, x, adj):
        w = self.param("weight", _uniform_init(), (x.shape[-1], self.features))
        b = self.param("bias", _uniform_init(), (self.features,))
        return jnp.tanh(adj @ (x @ w) + b + x)


class GSAGELayer(nn.Module):
    """x' = tanh([x ∥ adj@x] W + b) (module_helper.py:787-821 + GSAGE
    wrapper graph_attention_network.py:27-38)."""

    features: int

    @nn.compact
    def __call__(self, x, adj):
        w = self.param("weight", _uniform_init(), (2 * x.shape[-1], self.features))
        b = self.param("bias", _uniform_init(), (self.features,))
        agg = adj @ x
        return jnp.tanh(jnp.concatenate([x, agg], axis=-1) @ w + b)


class GATLayer(nn.Module):
    """Dense graph attention layer (reference: GAT wrapper
    graph_attention_network.py:41-66 over timm-style GraphAttentionLayer in
    lib/module/module_helper.py): e_ij = LeakyReLU(aᵀ[Wh_i ∥ Wh_j]),
    α = softmax(e masked by adjacency), h' = σ(α (Wh))."""

    features: int
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x, adj):
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (x.shape[-1], self.features))
        a = self.param("attn", nn.initializers.xavier_uniform(),
                       (2 * self.features, 1))
        h = x @ w  # (N, F)
        n = h.shape[0]
        e = jnp.concatenate(
            [jnp.repeat(h, n, axis=0), jnp.tile(h, (n, 1))], axis=1
        ) @ a
        e = nn.leaky_relu(e.reshape(n, n), negative_slope=self.alpha)
        e = jnp.where(adj > 0, e, -1e9)
        att = jax.nn.softmax(e, axis=-1)
        return jnp.tanh(att @ h)


class Discriminator(nn.Module):
    """Linear-LeakyReLU-Dropout-Linear-Sigmoid (module_helper.py:828-848)."""

    hidfeat: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Dense(self.hidfeat, kernel_init=nn.initializers.xavier_uniform())(x)
        x = nn.leaky_relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(1, kernel_init=nn.initializers.xavier_uniform())(x)
        return nn.sigmoid(x)


def normalize_adj(mx: jax.Array) -> jax.Array:
    """Row-normalize D⁻¹A with inf→0 (graph_attention_network.py:1128-1140)."""
    rowsum = mx.sum(axis=1)
    r_inv = jnp.where(rowsum != 0, 1.0 / rowsum, 0.0)
    return mx * r_inv[:, None]


class LearnableTopologyBGNN(nn.Module):
    """The BGNN variants behind one module; `adj_mode` selects them.

    forward returns dict(unify_prototype, bi_graphs, adv_pairs, adj_block,
    ret_feats): bi_graphs is the per-dataset list of **softmax** graphs (the
    differentiable half); the discrete/max half is composed by the caller
    from `adj_block` via uot_match or max-masking (see
    mds_tpu.engine.gnn_trainer) because it is non-differentiable host logic
    in the reference too (detached uot_bi, ltbgnn_direct_learn.py:367-377).

    Research-fork coverage (reference lib/models/ltbgnn_*.py):
      * adj_mode='direct'       — (T, M) adjacency param (ltbgnn_direct_learn)
      * adj_mode='direct_full'  — full (T+M)² adjacency param, cross-blocks
                                  masked (ltbgnn_direct_learn3 / ltbgnn_sfg)
      * adj_mode='cosine'       — cosine similarity of adj features
      * n_gcn_layers=3          — the SFG fork's shallower stack
      * with_unlabel=True       — one extra learnable 'unlabeled' node per
                                  dataset, appended to its class block
                                  (ltbgnn_unlabel.py:107-139); bipartite
                                  blocks then have n_cats_i+1 rows
    """

    dataset_cats: Sequence[int]
    nfeat: int = 1024
    nfeat_out: int = 512
    nfeat_adj: int = 256
    output_feat_dim: int = 512
    unify_ratio: float = 1.0
    dropout_rate: float = 0.5
    gnn_type: str = "GSAGE"  # or "GCN"
    adj_mode: str = "direct"  # "direct" | "direct_full" | "cosine"
    mse_or_adv: str = "None"  # "mse" | "adv" | "None"
    with_datasets_aux: bool = False
    init_stage: bool = False  # direct mode: raw adjacency (no softmax)
    temperature: float = 0.07
    n_gcn_layers: int = 4  # SFG fork uses 3 (ltbgnn_sfg.py)
    with_unlabel: bool = False  # ltbgnn_unlabel: +1 node per dataset

    @property
    def eff_cats(self) -> Tuple[int, ...]:
        """Per-dataset graph-node counts (+1 unlabeled node when enabled)."""
        if self.with_unlabel:
            return tuple(c + 1 for c in self.dataset_cats)
        return tuple(self.dataset_cats)

    @property
    def total_nodes(self) -> int:
        """Dataset-side node count (incl. unlabeled nodes)."""
        return int(sum(self.eff_cats))

    @property
    def total_cats(self) -> int:
        return int(sum(self.dataset_cats))

    @property
    def max_num_unify_class(self) -> int:
        return int(self.unify_ratio * self.total_cats)

    # GNN.model_name → constructor overrides: the research forks route here
    # (ltbgnn_direct_learn / _3 / _tg, ltbgnn_sfg, ltbgnn_unlabel, BGAT)
    _NAME_KW = {
        "learnable_topology_BGNN": dict(adj_mode="cosine"),
        "learnable_topology_BGNN_adj": dict(adj_mode="direct"),
        "learnable_topology_BGNN_adj_tg": dict(adj_mode="direct"),
        "learnable_topology_BGNN_adj3": dict(adj_mode="direct_full"),
        "learnable_topology_BGNN_sfg": dict(adj_mode="direct_full",
                                            n_gcn_layers=3),
        "learnable_topology_BGNN_unlabel": dict(adj_mode="direct",
                                                with_unlabel=True),
        "learnable_topology_BGAT": dict(adj_mode="cosine", gnn_type="GAT"),
    }

    @classmethod
    def from_configer(cls, configer, adj_mode: Optional[str] = None, **kw):
        n = configer.n_datasets
        name = configer.get("GNN", "model_name", default="learnable_topology_BGNN_adj")
        name_kw = dict(cls._NAME_KW.get(
            name, {"adj_mode": "direct" if name.endswith("_adj") else "cosine"}
        ))
        if adj_mode is not None:
            name_kw["adj_mode"] = adj_mode
        for k, v in name_kw.items():
            kw.setdefault(k, v)
        adj_mode = kw.pop("adj_mode")
        base = dict(
            dataset_cats=tuple(configer.n_cats(i) for i in range(n)),
            nfeat=int(configer.get("GNN", "nfeat", default=1024)),
            nfeat_out=int(configer.get("GNN", "nfeat_out", default=512)),
            nfeat_adj=int(configer.get("GNN", "nfeat_adj", default=256)),
            output_feat_dim=int(configer.get("GNN", "output_feat_dim", default=512)),
            unify_ratio=float(configer.get("GNN", "unify_ratio", default=1.0)),
            dropout_rate=float(configer.get("GNN", "dropout_rate", default=0.5)),
            gnn_type=configer.get("GNN", "GNN_type", default="GSAGE"),
            adj_mode=adj_mode,
            mse_or_adv=configer.get("GNN", "mse_or_adv", default="None"),
            with_datasets_aux=bool(
                configer.get("loss", "with_datasets_aux", default=False)
            ),
            init_stage=bool(configer.get("GNN", "init_by_eval", default=False)),
        )
        base.update(kw)  # explicit kwargs beat config-derived values
        return cls(**base)

    def setup(self):
        T, M = self.total_nodes, self.max_num_unify_class
        self.linear_before = nn.Dense(self.nfeat_out)
        self.linear_adj = nn.Dense(self.nfeat_adj)
        self.linear1 = nn.Dense(self.output_feat_dim)
        layer_cls = {"GSAGE": GSAGELayer, "GCN": GCNLayer, "GAT": GATLayer}[
            self.gnn_type
        ]
        self.gcn_layers = [
            layer_cls(self.nfeat_out) for _ in range(self.n_gcn_layers)
        ]
        self.unify_node_features = self.param(
            "unify_node_features", nn.initializers.truncated_normal(0.02),
            (M, self.nfeat), jnp.float32,
        )
        if self.with_unlabel:
            # one learnable 'unlabeled' node per dataset
            # (ltbgnn_unlabel.py:107-110)
            self.unlabel_node_features = self.param(
                "unlabel_node_features", nn.initializers.truncated_normal(0.02),
                (len(self.dataset_cats), self.nfeat), jnp.float32,
            )
        if self.adj_mode == "direct":
            # torch.rand init (ltbgnn_direct_learn.py:256)
            self.adj_matrix = self.param(
                "adj_matrix",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, 0.0, 1.0),
                (T, M),
            )
        elif self.adj_mode == "direct_full":
            # full-square adjacency param; only the bipartite cross blocks
            # survive the mask (ltbgnn_direct_learn3 / ltbgnn_sfg)
            self.adj_matrix = self.param(
                "adj_matrix",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, 0.0, 1.0),
                (T + M, T + M),
            )
        if self.mse_or_adv == "adv":
            self.netD = [
                Discriminator(dropout=self.dropout_rate)
                for _ in range(self.n_gcn_layers)
            ]

    # ---------------------------------------------------------------- adjacency
    def _softmax_blocks(self, block: jax.Array) -> jax.Array:
        """Per-dataset softmax(τ) over the dataset-class axis of the
        (total_nodes, M) bipartite block."""
        outs = []
        cur = 0
        for c in self.eff_cats:
            outs.append(jax.nn.softmax(block[cur : cur + c] / self.temperature, axis=0))
            cur += c
        return jnp.concatenate(outs, axis=0)

    def calc_adjacency(self, feat1: jax.Array):
        """→ (norm_adj (T+M,T+M), bipartite_block (T,M) post-softmax,
        adj_feat or None)."""
        T, M = self.total_nodes, self.max_num_unify_class
        if self.adj_mode == "direct":
            block = self.adj_matrix
            if not self.init_stage:
                block = self._softmax_blocks(block)
            adj_feat = None
        elif self.adj_mode == "direct_full":
            block = self.adj_matrix[:T, T:]
            if not self.init_stage:
                block = self._softmax_blocks(block)
            adj_feat = None
        else:
            adj_feat = self.linear_adj(feat1)
            nf = adj_feat / jnp.maximum(
                jnp.linalg.norm(adj_feat, axis=1, keepdims=True), 1e-12
            )
            sim = nf @ nf.T
            block = self._softmax_blocks(sim[:T, T:])
        upper = jnp.concatenate([jnp.zeros((T, T), block.dtype), block], axis=1)
        lower = jnp.concatenate([block.T, jnp.zeros((M, M), block.dtype)], axis=1)
        adj = jnp.concatenate([upper, lower], axis=0)
        return normalize_adj(adj), block, adj_feat

    # ---------------------------------------------------------------- forward
    def __call__(self, x: jax.Array, *, train: bool = True):
        """x: (total_cats, nfeat) dataset class-node features."""
        T = self.total_nodes
        if self.with_unlabel:
            # interleave each dataset's class nodes with its unlabeled node
            # (ltbgnn_unlabel.py:135-141)
            parts = []
            cur = 0
            for i, c in enumerate(self.dataset_cats):
                parts.append(x[cur : cur + c])
                parts.append(self.unlabel_node_features[i : i + 1])
                cur += c
            x = jnp.concatenate(parts, axis=0)
        input_x = jnp.concatenate([x, self.unify_node_features], axis=0)
        feat1 = self.linear_before(input_x)
        adj, block, adj_feat = self.calc_adjacency(feat1)
        h = nn.relu(feat1)

        def dropout(t):
            if not train or self.dropout_rate <= 0.0:
                return t
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout_rate, t.shape
            )
            return jnp.where(keep, t / (1.0 - self.dropout_rate), 0.0)

        feats = []
        adv_pairs = []
        for li, layer in enumerate(self.gcn_layers):
            h_in = dropout(h)
            h_out = layer(h_in, adj)
            prev = nn.relu(feat1) if li == 0 else feats[-1]
            adv_pairs.append((jax.lax.stop_gradient(prev), h_out))
            feats.append(h_out)
            h = h_out

        feat_out = self.linear1(feats[-1])
        proto = feat_out if self.with_datasets_aux else feat_out[T:]
        bi_graphs = self.sep_bipartite_graphs(block)
        ret_feats = [f[T:] for f in feats] + [feat_out[T:]]
        out = {
            "unify_prototype": proto,
            "bi_graphs": bi_graphs,
            "adv_pairs": adv_pairs,
            "adj_block": block,
            "ret_feats": ret_feats,
        }
        if self.mse_or_adv == "adv":
            # the reference runs the discriminators inside forward
            # (graph_attention_network.py:976-1022 out_real/out_fake/g_out)
            out["adv_out"] = self.discriminate(adv_pairs, train=train)
        return out

    def sep_bipartite_graphs(self, block: jax.Array) -> List[jax.Array]:
        """Per-dataset softmax graphs (eff_cats_i, M); the max/discrete
        variants are composed outside (max_mask_graphs / uot)."""
        out = []
        cur = 0
        for c in self.eff_cats:
            out.append(block[cur : cur + c])
            cur += c
        return out

    def infer_prototypes(self, x: jax.Array):
        """get_optimal_matching's deterministic forward (no dropout):
        → (prototype rows, raw bipartite block) — the caller runs UOT/identity
        on the block (ltbgnn_direct_learn.py:555-640)."""
        out = self.__call__(x, train=False)
        return out["unify_prototype"], out["adj_block"]

    def discriminate(self, adv_pairs, *, train: bool):
        """adv mode: run the 4 discriminators on (real.detach, fake.detach,
        fake) triples (graph_attention_network.py:976-1022)."""
        assert self.mse_or_adv == "adv"
        outs = {}
        for i, (real, fake) in enumerate(adv_pairs):
            d = self.netD[i]
            outs[f"ADV{i + 1}"] = [
                d(jax.lax.stop_gradient(real), train=train),
                d(jax.lax.stop_gradient(fake), train=train),
                d(fake, train=train),
            ]
        return outs


def max_mask_graphs(block, dataset_cats) -> List[jax.Array]:
    """The non-Gumbel 'max' graphs: zero all but each column's max row
    (graph_attention_network.py:1060-1068)."""
    out = []
    cur = 0
    for c in dataset_cats:
        g = block[cur : cur + c]
        mx = jnp.max(g, axis=0, keepdims=True)
        out.append(jnp.where(g == mx, g, 0.0))
        cur += c
    return out


def gumbel_softmax_decay(current_iter: int, r: float = 2e-5,
                         max_temp: float = 10.0,
                         min_temp: float = 0.01) -> float:
    """Annealing schedule from Jang et al. (ICLR'17), reference
    np_gumbel_softmax_decay (graph_attention_network.py:1207-1218):
    τ = max(min_temp, max_temp·e^(−r·iter))."""
    import numpy as np

    return float(np.maximum(min_temp, max_temp * np.exp(-r * current_iter)))


def gumbel_max_graphs(block, dataset_cats, tau, rng) -> List[jax.Array]:
    """Annealed Gumbel-softmax 'max' graphs — the GNN.GumbelSoftmax=true path
    of sep_bipartite_graphs (graph_attention_network.py:1059-1063):
    per dataset, F.gumbel_softmax(10·block, τ, hard=False, dim=0) =
    softmax((10·block + Gumbel noise)/τ) over the dataset-class axis.
    Differentiable — as τ anneals toward min_temp the samples sharpen toward
    the discrete column-max graphs."""
    out = []
    cur = 0
    keys = jax.random.split(rng, len(dataset_cats))
    for i, c in enumerate(dataset_cats):
        g = block[cur : cur + c]
        u = jax.random.uniform(
            keys[i], g.shape, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
        )
        gumbel = -jnp.log(-jnp.log(u))
        out.append(jax.nn.softmax((10.0 * g + gumbel) / tau, axis=0))
        cur += c
    return out


class AttentionalPropagation(nn.Module):
    """Masked multi-head attention message passing (SuperGlue-style MPA used
    by Self_Attention_GNN, graph_attention_network.py:268-270,300-309):
    message = MHA(q=x, k=v=source, mask=adj>0); out = MLP([x ∥ message])."""

    features: int
    nheads: int = 4

    @nn.compact
    def __call__(self, x, source, adj):
        h = self.nheads
        d = max(self.features // h, 1)
        q = nn.Dense(h * d, name="q")(x).reshape(-1, h, d)
        k = nn.Dense(h * d, name="k")(source).reshape(-1, h, d)
        v = nn.Dense(h * d, name="v")(source).reshape(-1, h, d)
        logits = jnp.einsum("nhd,mhd->hnm", q, k) / jnp.sqrt(d)
        logits = jnp.where(adj[None] > 0, logits, -1e9)
        att = jax.nn.softmax(logits, axis=-1)
        msg = jnp.einsum("hnm,mhd->nhd", att, v).reshape(-1, h * d)
        return nn.Dense(self.features, name="mlp")(
            jnp.concatenate([x, msg], axis=-1)
        )


def fixed_block_adjacency(dataset_cats: Sequence[int], M: int) -> jax.Array:
    """The Self_Attention_GNN fixed adjacency (init_adjacency_matrix,
    graph_attention_network.py:374-420): unified rows/cols fully connected,
    per-dataset identity sub-blocks on the bipartite diagonal, identity
    within each side; symmetrically normalized D^-1/2 A D^-1/2."""
    import numpy as np

    T = int(sum(dataset_cats))
    A = np.zeros((T + M, T + M), np.float32)
    A[T:, :] = 1.0
    A[:, T:] = 1.0
    cur = 0
    for c in dataset_cats:
        # clip the identity sub-block when unify_ratio < 1 shrinks M below
        # the running class offset (the reference indexes out of range here)
        cc = min(c, max(M - cur, 0))
        if cc > 0:
            A[cur:cur + cc, T + cur:T + cur + cc] = np.eye(cc)
            A[T + cur:T + cur + cc, cur:cur + cc] = np.eye(cc)
        cur += c
    A[:T, :T] = np.eye(T)
    A[T:, T:] = np.eye(M)
    r = A.sum(1)
    r_inv_sqrt = np.where(r > 0, r ** -0.5, 0.0)
    return jnp.asarray(r_inv_sqrt[:, None] * A * r_inv_sqrt[None, :])


class SelfAttentionGNN(nn.Module):
    """Dense attention variant (Self_Attention_GNN,
    graph_attention_network.py:244-420): fixed normalized block adjacency,
    two AttentionalPropagation layers with residual, bipartite graphs from
    an arch-feature similarity softmax (τ=0.05, calc_bipartite_graph
    :316-357); `pretrain=True` returns the identity graphs (the
    fix_architecture_alter_iter gate's early phase)."""

    dataset_cats: Sequence[int]
    nfeat: int = 1024
    nfeat_out: int = 512
    nheads: int = 4
    adj_feat_dim: int = 256
    output_feat_dim: int = 512
    unify_ratio: float = 1.0
    dropout_rate: float = 0.5

    @property
    def total_cats(self) -> int:
        return int(sum(self.dataset_cats))

    @property
    def max_num_unify_class(self) -> int:
        return int(self.unify_ratio * self.total_cats)

    @classmethod
    def from_configer(cls, configer, **kw):
        n = configer.n_datasets
        g = lambda *k, d=None: configer.get(*k, default=d)
        return cls(
            dataset_cats=tuple(configer.n_cats(i) for i in range(n)),
            nfeat=int(g("GNN", "nfeat", d=1024)),
            nfeat_out=int(g("GNN", "nfeat_out", d=512)),
            nheads=int(g("GNN", "nheads", d=4)),
            adj_feat_dim=int(g("GNN", "adj_feat_dim", d=256)),
            output_feat_dim=int(g("GNN", "output_feat_dim", d=512)),
            unify_ratio=float(g("GNN", "unify_ratio", d=1.0)),
            dropout_rate=float(g("GNN", "dropout_rate", d=0.5)),
            **kw,
        )

    @nn.compact
    def __call__(self, x, *, train: bool = True, pretrain: bool = False):
        T, M = self.total_cats, self.max_num_unify_class
        unify = self.param(
            "unify_node_features", nn.initializers.truncated_normal(0.02),
            (M, self.nfeat), jnp.float32,
        )
        adj = fixed_block_adjacency(self.dataset_cats, M)
        x = jnp.concatenate([x, unify], axis=0)
        x = nn.relu(nn.Dense(self.nfeat_out, name="linear_before")(x))
        drop = nn.Dropout(self.dropout_rate, deterministic=not train)
        x = drop(x)
        feat = AttentionalPropagation(
            self.nfeat_out, self.nheads, name="attn1"
        )(x, x, adj)
        x = drop(feat)
        x = nn.elu(
            AttentionalPropagation(self.nfeat_out, self.nheads, name="attn2")(
                x, x, adj
            ) + x
        )
        proto = nn.Dense(self.output_feat_dim, name="linear1")(x)
        arch = nn.Dense(self.adj_feat_dim, name="arch_linear")(nn.relu(x))
        if pretrain:
            from mds_tpu.ops.uot_match import pretrain_bipartite_graphs

            graphs = [jnp.asarray(g)
                      for g in pretrain_bipartite_graphs(self.dataset_cats, M)]
        else:
            uf = arch[T:]
            graphs = []
            cur = 0
            for c in self.dataset_cats:
                sim = jnp.einsum("nc,mc->nm", arch[cur:cur + c], uf)
                graphs.append(jax.nn.softmax(sim / 0.05, axis=0))
                cur += c
        return {"unify_prototype": proto[T:], "bi_graphs": graphs}


class LearnableTopologyGAT(nn.Module):
    """GAT with learned adjacency (Learnable_Topology_GAT,
    graph_attention_network.py:670-860): cosine adjacency over adj features,
    nheads GAT layers (concat + residual), out-attention with elu residual,
    bipartite graphs = per-dataset softmax(raw block / 0.07)."""

    dataset_cats: Sequence[int]
    nfeat: int = 1024
    nfeat_out: int = 512
    nfeat_adj: int = 256
    nhid: int = 128
    nheads: int = 4
    output_feat_dim: int = 512
    unify_ratio: float = 1.0
    dropout_rate: float = 0.5
    temperature: float = 0.07

    @property
    def total_cats(self) -> int:
        return int(sum(self.dataset_cats))

    @property
    def max_num_unify_class(self) -> int:
        return int(self.unify_ratio * self.total_cats)

    @classmethod
    def from_configer(cls, configer, **kw):
        n = configer.n_datasets
        g = lambda *k, d=None: configer.get(*k, default=d)
        return cls(
            dataset_cats=tuple(configer.n_cats(i) for i in range(n)),
            nfeat=int(g("GNN", "nfeat", d=1024)),
            nfeat_out=int(g("GNN", "nfeat_out", d=512)),
            nfeat_adj=int(g("GNN", "nfeat_adj", d=256)),
            nhid=int(g("GNN", "nhid", d=128)),
            nheads=int(g("GNN", "nheads", d=4)),
            output_feat_dim=int(g("GNN", "output_feat_dim", d=512)),
            unify_ratio=float(g("GNN", "unify_ratio", d=1.0)),
            dropout_rate=float(g("GNN", "dropout_rate", d=0.5)),
            **kw,
        )

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        T, M = self.total_cats, self.max_num_unify_class
        unify = self.param(
            "unify_node_features", nn.initializers.truncated_normal(0.02),
            (M, self.nfeat), jnp.float32,
        )
        x = jnp.concatenate([x, unify], axis=0)
        x = nn.Dense(self.nfeat_out, name="linear_before")(x)
        # learned cosine adjacency (calc_adjacency_matrix pattern)
        af = nn.Dense(self.nfeat_adj, name="linear_adj")(x)
        nf = af / jnp.maximum(jnp.linalg.norm(af, axis=1, keepdims=True), 1e-12)
        sim = nf @ nf.T
        block_raw = sim[:T, T:]
        blocks = []
        cur = 0
        for c in self.dataset_cats:
            blocks.append(
                jax.nn.softmax(block_raw[cur:cur + c] / self.temperature, axis=0)
            )
            cur += c
        block = jnp.concatenate(blocks, axis=0)
        upper = jnp.concatenate([jnp.zeros((T, T)), block], axis=1)
        lower = jnp.concatenate([block.T, jnp.zeros((M, M))], axis=1)
        adj = normalize_adj(jnp.concatenate([upper, lower], axis=0))

        x = nn.relu(x)
        heads = [
            GATLayer(self.nhid, name=f"att1_{h}")(x, adj)
            for h in range(self.nheads)
        ]
        feat = jnp.concatenate(heads, axis=1)
        if feat.shape[-1] == x.shape[-1]:
            x = feat + x
        else:
            x = feat
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        out = GATLayer(x.shape[-1], name="out_att")(x, adj)
        x = nn.elu(out + x)
        proto = nn.Dense(self.output_feat_dim, name="linear1")(x)
        graphs = []
        cur = 0
        for c in self.dataset_cats:
            graphs.append(
                jax.nn.softmax(block_raw[cur:cur + c] / 0.07, axis=0)
            )
            cur += c
        return {"unify_prototype": proto[T:], "bi_graphs": graphs,
                "adj_block": block_raw}


@MODELS.register("self_attention_GNN")
def self_attention_gnn(configer=None, **kw):
    return SelfAttentionGNN.from_configer(configer, **kw)


@MODELS.register("learnable_topology_GAT")
def learnable_topology_gat(configer=None, **kw):
    return LearnableTopologyGAT.from_configer(configer, **kw)


@MODELS.register("learnable_topology_BGNN_adj")
def ltbgnn_adj(configer=None, **kw):
    return LearnableTopologyBGNN.from_configer(configer, adj_mode="direct", **kw)


@MODELS.register("learnable_topology_BGNN")
def ltbgnn(configer=None, **kw):
    return LearnableTopologyBGNN.from_configer(configer, adj_mode="cosine", **kw)


@MODELS.register("learnable_topology_BGNN_unlabel")
def ltbgnn_unlabel(configer=None, **kw):
    """ltbgnn_unlabel.py fork: +1 learnable unlabeled node per dataset."""
    kw.setdefault("with_unlabel", True)
    return LearnableTopologyBGNN.from_configer(configer, adj_mode="direct", **kw)


@MODELS.register("learnable_topology_BGNN_sfg")
def ltbgnn_sfg(configer=None, **kw):
    """ltbgnn_sfg.py fork: full-square adjacency param, 3 GCN layers."""
    kw.setdefault("n_gcn_layers", 3)
    return LearnableTopologyBGNN.from_configer(
        configer, adj_mode="direct_full", **kw
    )


@MODELS.register("learnable_topology_BGNN_adj3")
def ltbgnn_adj3(configer=None, **kw):
    """ltbgnn_direct_learn3.py fork: full-square masked adjacency param."""
    return LearnableTopologyBGNN.from_configer(
        configer, adj_mode="direct_full", **kw
    )


@MODELS.register("learnable_topology_BGNN_adj_tg")
def ltbgnn_adj_tg(configer=None, **kw):
    """ltbgnn_direct_learn_tg.py: same model — the target-graph supervision
    lives in the loss (CrossDatasetsCELossAdvGNN target_bi_graph term +
    ops/target_graph.py builders)."""
    return LearnableTopologyBGNN.from_configer(configer, adj_mode="direct", **kw)


@MODELS.register("learnable_topology_BGAT")
def ltbgat(configer=None, **kw):
    """BGNN with GAT layers (graph_attention_network.py Learnable_Topology_
    BGAT): cosine adjacency + dense graph-attention propagation."""
    kw.setdefault("gnn_type", "GAT")
    return LearnableTopologyBGNN.from_configer(configer, adj_mode="cosine", **kw)


@MODELS.register("graph_attention_network")
def gat_fixed(configer=None, **kw):
    """Plain GAT over the fixed block adjacency (reference GAT class,
    graph_attention_network.py:69-241) — covered by the SelfAttentionGNN
    propagation structure with GAT-style masked attention."""
    return SelfAttentionGNN.from_configer(configer, **kw)
