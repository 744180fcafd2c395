"""Device inference pipeline + per-chromosome prediction driver.

The reference rasterizes candidates one-by-one with OpenCV on the host and
feeds a TF1 session per batch (predict.py:148-300, create_batch.py:88-155).
Here the whole hot path — segment-pair endpoints -> similarity images -> CNN
-> (argmax, softmax) — is ONE jitted XLA program per batch: rasterization
happens as MXU matmuls (ops/rasterize.py) fused with the convolutions, and
only two tiny vectors come back to the host.

The host-side decode state machine (region flushes, per-read type maps, the
forward-INV drop) is a behavioral port of Predict.run (predict.py:206-300)
over the structured Candidate table instead of the reference's
'svision'-joined label strings.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple  # noqa: F401 (List in hints)

import numpy as np
import jax
import jax.numpy as jnp

from svision_tpu.collect.candidates import Candidate, candidates_to_specs
from svision_tpu.infer.aggregate import get_region_potential_svtypes
from svision_tpu.call.vcfout import write_results_to_vcf
from svision_tpu.models import alexnet
from svision_tpu.ops import rasterize


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _device_step(params, endpoints, visible, reverse,
                 compute_dtype=jnp.bfloat16):
    """endpoints [B,S,4] -> (argmax [B], selected softmax [B])."""
    images = rasterize.render_images(endpoints, visible, reverse,
                                     dtype=jnp.float32)
    logits = alexnet.forward(params, images, compute_dtype=compute_dtype)
    pred = jnp.argmax(logits, axis=1)
    soft = jax.nn.softmax(logits, axis=1)
    # soft[argmax] == max(soft) (softmax is monotone): same element, no gather
    return pred, jnp.max(soft, axis=1)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "raster_kind"))
def _device_step_fast(folded_params, endpoints, visible, reverse,
                      compute_dtype=jnp.bfloat16, raster_kind="s2d"):
    """Fast path: {0,1} raster straight into the folded space-to-depth CNN
    (alexnet.fold_conv1_params) — no f32 image tensor in HBM.

    raster_kind selects the encoder: 's2d' (elementwise predicate emitted
    directly in conv1's space-to-depth layout — the default, 73.8k images/s
    on v5e vs 55.5k for the round-1 einsum), 'compare' (same predicate in
    image layout), 'einsum' (MXU one-hot contraction) or 'pallas' (VPU
    membership kernel, ops/pallas_raster.py). int8 excludes 's2d' (there is
    no int8 forward_s2d); InferenceEngine normalizes raster to 'compare' at
    init in that case — output is identical, the formulations are
    bitwise-equal."""
    int8 = compute_dtype == jnp.int8
    raster_dtype = jnp.bfloat16 if int8 else compute_dtype
    if raster_kind == "s2d" and not int8:
        h = rasterize.render_raster_s2d(endpoints, visible, reverse,
                                        dtype=raster_dtype)
        logits = alexnet.forward_s2d(folded_params, h,
                                     compute_dtype=compute_dtype)
        pred = jnp.argmax(logits, axis=1)
        soft = jax.nn.softmax(logits, axis=1)
        return pred, jnp.max(soft, axis=1)
    if raster_kind == "pallas":
        from svision_tpu.ops.pallas_raster import render_raster_pallas
        raster = render_raster_pallas(endpoints, visible, reverse,
                                      dtype=raster_dtype)
    elif raster_kind == "einsum":
        raster = rasterize.render_raster_einsum(endpoints, visible, reverse,
                                                dtype=raster_dtype)
    else:
        raster = rasterize.render_raster(endpoints, visible, reverse,
                                         dtype=raster_dtype)
    if int8:
        logits = alexnet.forward_raster_int8(folded_params, raster)
    else:
        logits = alexnet.forward_raster(folded_params, raster,
                                        compute_dtype=compute_dtype)
    pred = jnp.argmax(logits, axis=1)
    soft = jax.nn.softmax(logits, axis=1)
    # soft[argmax] == max(soft) (softmax is monotone): same element, no gather
    return pred, jnp.max(soft, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("compute_dtype", "fast", "raster_kind"))
def _device_step_many(params, endpoints, visible, reverse,
                      compute_dtype=jnp.bfloat16, fast=True,
                      raster_kind="s2d"):
    """Chunked dispatch: inputs [C, B, ...] -> (preds [C*B], softs [C*B]).

    A lax.scan over C batches inside ONE program: one host->device transfer
    and one dispatch per super-chunk instead of per batch. On the axon TPU
    tunnel, per-dispatch latency capped the per-batch path at ~25k images/s
    regardless of program content; this amortizes it C-fold.
    """
    def body(_, inp):
        ep_i, vis_i, rev_i = inp
        if fast:
            p, s = _device_step_fast(params, ep_i, vis_i, rev_i,
                                     compute_dtype=compute_dtype,
                                     raster_kind=raster_kind)
        else:
            p, s = _device_step(params, ep_i, vis_i, rev_i,
                                compute_dtype=compute_dtype)
        return None, (p, s)

    _, (preds, softs) = jax.lax.scan(body, None, (endpoints, visible, reverse))
    return preds.reshape(-1), softs.reshape(-1)


class InferenceEngine:
    """Batched encoder+CNN forward with static batch shape (one compile).

    All batches of a call are dispatched asynchronously and synced once at
    the end — per-batch host round trips through the device link would
    dominate otherwise (profiled ~6x on the TPU tunnel)."""

    def __init__(self, params, batch_size: int = 128, bf16: bool = True,
                 fast: bool = True, chunk: int = 128, raster: str = "s2d",
                 tail: Optional[str] = None, int8: bool = False, mesh=None):
        # mesh: optional jax.sharding.Mesh with a 'data' axis — batch rows
        # shard over it (data-parallel forward, params replicated; XLA needs
        # no collectives). None = single-device placement.
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = mesh.shape["data"]
            batch_size = -(-batch_size // data) * data  # equal shards
            self.mesh = mesh
            self._sh_batch = NamedSharding(mesh, P("data"))      # [B, ...]
            self._sh_chunk = NamedSharding(mesh, P(None, "data"))  # [nb,B,...]
            self._sh_repl = NamedSharding(mesh, P())
        else:
            self.mesh = None
            self._sh_batch = self._sh_chunk = self._sh_repl = None
        self.batch_size = batch_size
        self.chunk = chunk              # batches per device dispatch
        self.raster = raster  # 's2d' (default) | 'compare' | 'einsum' | 'pallas'
        # int8 turbo: quantized MXU path (2x bf16 rate on v5e); jnp.int8 as
        # compute_dtype selects it inside the jitted steps
        self.int8 = int8 and bf16 and fast
        if self.int8 and raster == "s2d":
            # the s2d encoder feeds forward_s2d, which has no int8 variant;
            # normalize to the bitwise-equal image-layout predicate here so
            # the selected kind is visible rather than silently overridden
            # inside _device_step_fast
            self.raster = "compare"
        self.compute_dtype = (jnp.int8 if self.int8
                              else jnp.bfloat16 if bf16 else jnp.float32)
        # exact mode (bf16=False) keeps the reference-faithful f32 path;
        # the folded fast path's reassociation error is below bf16 rounding
        # anyway, so it only ever rides with bf16
        self.fast = fast and bf16
        if self.fast:
            # Fold + pre-cast on the HOST (alexnet.fold_params_bf16:
            # bitwise-identical logits, half the host->device transfer —
            # 227 MB f32 costs ~27 s on the tunneled link — and one device
            # copy instead of raw + folded); int8 turbo ships int8 weights
            # + f32 per-channel scales instead (4x less transfer).
            host = {k: np.asarray(v) for k, v in params.items()}
            if self.int8:
                quant = alexnet.quantize_params_int8(
                    alexnet.fold_conv1_params(host))
                self.folded_params = {k: self._put_repl(v)
                                      for k, v in quant.items()}
            else:
                self.folded_params = {
                    k: self._put_repl(v)
                    for k, v in alexnet.fold_params_bf16(host).items()}
            self.params = host          # host-resident; unused on device
        else:
            self.params = jax.tree_util.tree_map(self._put_repl, params)
            self.folded_params = None
        # tail policy for the last partial super-chunk: 'full' pads it to a
        # full `chunk` scan (ONE extra program shape ever; ~0.4 s of wasted
        # sentinel compute per call on a v5e — nothing next to the 20-260 s a
        # fresh scan-shape compile costs on the tunneled backend); 'pow2'
        # compiles power-of-2 tail shapes lazily (cheap-compile backends
        # where runtime, not compile time, dominates — i.e. CPU tests)
        if tail is None:
            tail = "full" if jax.default_backend() != "cpu" else "pow2"
        assert tail in ("full", "pow2"), tail
        self.tail = tail

    def _put_repl(self, arr):
        """Params: replicated over the mesh (or plain device copy)."""
        if self.mesh is not None:
            return jax.device_put(jnp.asarray(arr), self._sh_repl)
        return jnp.asarray(arr)

    def _put_batch(self, arr):
        """One batch [B, ...]: rows sharded over 'data'."""
        if self.mesh is not None:
            return jax.device_put(arr, self._sh_batch)
        return jnp.asarray(arr)

    def _put_chunked(self, arr):
        """Batched batches [nb, B, ...]: dim 1 sharded over 'data', so both
        chunk slices (dim 0) and single-batch indexing stay shard-aligned."""
        if self.mesh is not None:
            return jax.device_put(arr, self._sh_chunk)
        return jnp.asarray(arr)

    @property
    def _run_params(self):
        return self.folded_params if self.fast else self.params

    _SENTINEL = np.array([[0, 1, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2]],
                         dtype=np.int64)   # create_batch.py:55
    # tails up to this many batches dispatch per-batch instead of padding
    # to a full super-chunk (see predict_specs)
    _TAIL_SINGLE_MAX = 16

    def _pad(self, specs: np.ndarray, multiple: int) -> np.ndarray:
        pad = (-specs.shape[0]) % multiple
        if pad:
            specs = np.concatenate(
                [specs, np.repeat(self._SENTINEL, pad, 0)], 0)
        return specs

    def warmup(self) -> None:
        """Compile AND first-execute every program shape this engine will
        dispatch: the single-batch program and, under the 'full' tail
        policy, one full sentinel super-chunk for the scan program. Run in a
        background thread (XLA compilation releases the GIL) to overlap the
        20-260 s compile + remote executable load with host-side signature
        collection."""
        self.predict_specs(np.repeat(self._SENTINEL, 1, 0))
        if self.tail == "full":
            # one full sentinel super-chunk: compiles AND first-executes the
            # scan program so the first real chromosome pays nothing.
            # (An AOT lower().compile() variant measured WORSE here: the
            # lowered HLO caches separately from the dispatch path and the
            # first executable call still paid ~1.6 s of load overhead.)
            self.predict_specs(
                np.repeat(self._SENTINEL, self.batch_size * self.chunk, 0))

    def warmup_async(self):
        """Start warmup() on a daemon thread; returns the thread (join before
        the first real predict call to avoid concurrent dispatch)."""
        import threading
        t = threading.Thread(target=self.warmup, name="engine-warmup",
                             daemon=True)
        t.start()
        return t

    def predict_specs(self, specs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """specs [N,12] -> (pred_ids [N], softmax_sel [N]); N arbitrary."""
        n = specs.shape[0]
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        bs = self.batch_size

        if n <= bs:
            # single-batch fast path: don't pad a handful of candidates up to
            # a whole super-chunk (common for small chromosomes)
            specs = self._pad(specs, bs)
            ep, vis, rev = rasterize.specs_to_endpoints(specs)
            if self.fast:
                p, s = _device_step_fast(self.folded_params,
                                         self._put_batch(ep),
                                         self._put_batch(vis),
                                         self._put_batch(rev),
                                         compute_dtype=self.compute_dtype,
                                         raster_kind=self.raster)
            else:
                p, s = _device_step(self.params, self._put_batch(ep),
                                    self._put_batch(vis),
                                    self._put_batch(rev),
                                    compute_dtype=self.compute_dtype)
            p.copy_to_host_async()
            s.copy_to_host_async()
            return np.asarray(p)[:n], np.asarray(s)[:n]

        # adaptive chunking: full super-chunks of `chunk` batches, then a
        # tail. Tail policy:
        #   'full' (TPU): a SHORT tail (<= _TAIL_SINGLE_MAX batches) goes out
        #     as per-batch dispatches of the already-compiled single-batch
        #     program — async, so their round-trips overlap; a long tail pads
        #     to one full chunk (one extra program shape ever). Padding a
        #     10-batch tail to a 128-batch scan costs ~0.4 s of sentinel
        #     compute PER CALL (per chromosome in the CLI) — per-batch
        #     dispatch costs ~a round-trip and no new compile.
        #   'pow2' (CPU tests): smallest covering power of 2 per tail —
        #     compiles are cheap there, runtime dominates.
        chunks: List[int] = []
        remaining = -(-n // bs)            # total batches needed
        while remaining >= self.chunk:
            chunks.append(self.chunk)
            remaining -= self.chunk
        singles = 0
        if remaining:
            if self.tail == "full":
                if remaining <= self._TAIL_SINGLE_MAX:
                    singles = remaining
                else:
                    chunks.append(self.chunk)
            else:
                c = 1
                while c < remaining:
                    c *= 2
                chunks.append(min(c, self.chunk))

        specs = self._pad(specs, bs * (sum(chunks) + singles))
        # Per-super-chunk host preprocessing + transfer + async dispatch:
        # the device starts on chunk 0 while the host computes chunk 1's
        # endpoints (specs_to_endpoints for a full call was ~50 ms of dead
        # time ahead of ~900 ms of queued device work when hoisted).
        # Transfers are tiny (~36 B/spec) and enqueue asynchronously.
        outs = []
        i = 0
        for c in chunks:
            rows = specs[i * bs:(i + c) * bs]
            ep, vis, rev = rasterize.specs_to_endpoints(rows)
            ep_d = self._put_chunked(ep.reshape(c, bs, *ep.shape[1:]))
            vis_d = self._put_chunked(vis.reshape(c, bs, *vis.shape[1:]))
            rev_d = self._put_chunked(rev.reshape(c, bs, *rev.shape[1:]))
            outs.append(_device_step_many(
                self._run_params, ep_d, vis_d, rev_d,
                compute_dtype=self.compute_dtype, fast=self.fast,
                raster_kind=self.raster))
            i += c
        for _ in range(singles):
            rows = specs[i * bs:(i + 1) * bs]
            ep, vis, rev = rasterize.specs_to_endpoints(rows)
            ep_d = self._put_batch(ep)
            vis_d = self._put_batch(vis)
            rev_d = self._put_batch(rev)
            if self.fast:
                outs.append(_device_step_fast(
                    self.folded_params, ep_d, vis_d, rev_d,
                    compute_dtype=self.compute_dtype,
                    raster_kind=self.raster))
            else:
                outs.append(_device_step(
                    self.params, ep_d, vis_d, rev_d,
                    compute_dtype=self.compute_dtype))
            i += 1
        # overlap ALL device->host result copies before converting: a
        # serial np.asarray per output pays one tunnel round-trip each
        # (~15 ms x 2 arrays x n_chunks measured 129 ms per 65k-image
        # call); async copies start together and drain in one wait
        for p, s in outs:
            p.copy_to_host_async()
            s.copy_to_host_async()
        preds = np.concatenate([np.asarray(p) for p, _ in outs])
        softs = np.concatenate([np.asarray(s) for _, s in outs])
        return preds[:n], softs[:n]


def predict_chromosome(candidates: List[Candidate], engine: InferenceEngine,
                       out_prefix: str, bam, options) -> None:
    """Predict + aggregate + write one chromosome's VCF fragment
    (Predict.run port, predict.py:148-300). Writes {out_prefix}.vcf and
    {out_prefix}.score.txt."""
    specs = candidates_to_specs(candidates)
    preds, softs = engine.predict_specs(specs)
    aggregate_chromosome(candidates, preds, softs, out_prefix, bam, options)


def aggregate_chromosome(candidates: List[Candidate], preds, softs,
                         out_prefix: str, bam, options) -> None:
    """Host half of predict_chromosome: region aggregation + genotyping +
    VCF-fragment write from already-computed CNN outputs. Split out so the
    CLI can run it in the worker pool while the next chromosome's batch is
    on the device (the genotyper's per-call BAM fetches dominate the
    predict stage at WGS scale — round-4 profile, docs/PERF.md)."""
    with open(out_prefix + ".vcf", "w") as vcf_out, \
            open(out_prefix + ".score.txt", "w") as score_out:

        reads_dict: Dict[str, Dict[int, List[int]]] = {}
        read_num_name_pair: Dict[str, str] = {}
        sig_score_pair: Dict[str, str] = {}
        sig_mechanisms_pair: Dict[str, str] = {}
        sig_types: List[str] = []
        predict_scores: List[float] = []
        last_region = ""

        def flush():
            sv_stats = get_region_potential_svtypes(reads_dict)
            write_results_to_vcf(vcf_out, score_out, sv_stats, last_region,
                                 read_num_name_pair, sig_types, sig_score_pair,
                                 predict_scores, sig_mechanisms_pair, bam,
                                 options)

        for i, cand in enumerate(candidates):
            pred = int(preds[i])
            read_num = cand.sig_id
            region = cand.region

            # forward pairs cannot be INV (predict.py:229-232)
            if cand.pair_forward == "True" and pred == 2:
                continue

            if region != last_region:
                if last_region != "":
                    flush()
                last_region = region
                reads_dict = {}
                read_num_name_pair = {}
                sig_score_pair = {}
                sig_types = []
                predict_scores = []
                sig_mechanisms_pair = {}

            key = read_num.replace("m", "")
            read_num_name_pair[key] = cand.qname
            sig_types.append(cand.sig_type)
            # keep the np.float32 scalar: the reference rounds the f32 softmax
            # (predict.py:249) and np.mean over f32 feeds the score file —
            # a float64 detour changes the printed score string
            predict_scores.append(round(np.float32(softs[i]), 2))
            sig_score_pair[key] = str(cand.score)
            sig_mechanisms_pair[key] = cand.mechanism

            bkp = [cand.bkp_start, cand.bkp_end, cand.bkp_len]
            if "m" not in read_num:
                # main-x-other pairs cannot claim DEL/INS (predict.py:278-286)
                if pred in (0, 1):
                    continue
                reads_dict.setdefault(read_num, {})[pred] = bkp
            else:
                reads_dict.setdefault(key, {})[pred] = bkp

        flush()
