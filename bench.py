#!/usr/bin/env python
"""Headline benchmark: ADE20k exemplar-translation inference throughput.

Measures images/sec/chip of the full inference path (correspondence net +
SPADE generator, 256x256, batch 6, the reference README.md:45 config) on the
default JAX device, and compares against the PyTorch-CPU reference
implementation (imported from /root/reference with the test sync-BN shim)
running the identical forward on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = 6
STEPS = 20
CPU_BATCH = 1  # torch-CPU on one core takes minutes per 256px image
CPU_STEPS = 3  # median-of-3: the round-1..3 single-shot baseline drifted 2x
               # with host contention; additionally the measured value is
               # cached in .bench_cpu_baseline.json (committed) so
               # vs_baseline stays comparable across rounds


def _opt():
    from cocosnet_tpu.config import test_defaults
    return test_defaults(
        dataset_mode="ade20k", label_nc=150, contain_dontcare_label=True,
        crop_size=256, load_size=256, batchSize=BATCH, use_attention=True,
        maskmix=True, PONO=True, PONO_C=True, warp_mask_losstype="direct",
        match_kernel=3, vgg_normal_correct=True, isTrain=False)


def _batch(opt):
    rs = np.random.RandomState(0)
    h = opt.crop_size
    return {
        "label": rs.randint(0, opt.semantic_nc,
                            (BATCH, h, h, 1)).astype(np.float32),
        "image": (rs.rand(BATCH, h, h, 3).astype(np.float32) * 2 - 1),
        "ref": (rs.rand(BATCH, h, h, 3).astype(np.float32) * 2 - 1),
        "label_ref": rs.randint(0, opt.semantic_nc,
                                (BATCH, h, h, 1)).astype(np.float32),
        "self_ref": np.ones((BATCH,), np.float32),
    }


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.nn import layers as L

    L.set_compute_dtype(jnp.bfloat16)

    opt = _opt()
    nets = P.Pix2PixNets(opt)
    base = _batch(opt)
    batch0 = {k: jax.device_put(v) for k, v in base.items()}
    variables = nets.init_all(jax.random.PRNGKey(0), batch0)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}

    # Serving-style measurement: K micro-batches scanned inside one jitted
    # program (one dispatch per K batches — a persistent server amortizes
    # dispatch the same way), returning a scalar checksum per batch. The
    # remote runtime here evaluates lazily and block_until_ready does not
    # force execution, so the timing fetches the checksums (negligible
    # transfer, forces all K forwards). Inputs differ per batch to defeat
    # any result caching.
    K = 8

    @jax.jit
    def run_k(variables, stacked):
        def body(carry, batch):
            data = P.preprocess_input(opt, batch)
            out = P.inference(nets, variables, data)
            return carry, jnp.sum(out["fake_image"])

        _, sums = jax.lax.scan(body, 0.0, stacked)
        return sums

    stacked = {
        k: jax.device_put(np.stack(
            [v + (np.float32(i) * 1e-3 if v.ndim == 4 and v.shape[-1] == 3
                  else 0.0) for i in range(K)]))
        for k, v in base.items()
    }

    np.asarray(run_k(variables, stacked))  # warm-up / compile
    rounds = max(1, STEPS // K)
    t0 = time.perf_counter()
    for _ in range(rounds):
        np.asarray(run_k(variables, stacked))
    dt = (time.perf_counter() - t0) / (rounds * K)
    return BATCH / dt


def bench_train(batch: int = 4, steps: int = 6, remat: bool = False,
                remat_policy: str = "block", scan_k: int = 0):
    """Training throughput: the fused G+D step (all 11 loss terms, TTUR,
    EMA, spectral norm) on the flagship ade20k config. Returns
    (img/s/chip, s/step). Steps chain through the donated TrainState so the
    timed fetch of the last metric forces the whole chain (one dispatch per
    step, lazy on the remote runtime).

    scan_k > 0 runs the steps through make_multi_train_step (lax.scan of
    scan_k steps per dispatch, train.py's --steps_per_dispatch): `steps`
    rounds up to a multiple of scan_k, one dispatch per chunk."""
    import jax
    import jax.numpy as jnp
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.nn import layers as L
    from cocosnet_tpu.train import state as S
    from cocosnet_tpu.train import steps as ST

    L.set_compute_dtype(jnp.bfloat16)
    opt = _opt().replace(isTrain=True, batchSize=batch, remat=remat,
                         remat_policy=remat_policy,
                         use_ema=True, weight_mask=100.0)
    nets = P.Pix2PixNets(opt)
    rs = np.random.RandomState(0)
    h = opt.crop_size
    base = {
        "label": rs.randint(0, opt.semantic_nc,
                            (batch, h, h, 1)).astype(np.float32),
        "image": (rs.rand(batch, h, h, 3).astype(np.float32) * 2 - 1),
        "ref": (rs.rand(batch, h, h, 3).astype(np.float32) * 2 - 1),
        "label_ref": rs.randint(0, opt.semantic_nc,
                                (batch, h, h, 1)).astype(np.float32),
        "self_ref": np.ones((batch,), np.float32),
    }
    dev_batch = {k: jax.device_put(v) for k, v in base.items()}
    variables = nets.init_all(jax.random.PRNGKey(0), dev_batch)
    state = S.create_train_state(opt, variables, jax.random.PRNGKey(0))
    lr = jnp.asarray(S.lrs_for_epoch(opt, 1))

    if scan_k > 0:
        step = jax.jit(ST.make_multi_train_step(nets), donate_argnums=(0,))
        chunk = {k: jnp.broadcast_to(v[None], (scan_k,) + v.shape)
                 for k, v in dev_batch.items()}
        n_chunks = max(1, (steps + scan_k - 1) // scan_k)
        state, metrics, _ = step(state, chunk, lr)  # compile + warm
        float(metrics[next(iter(metrics))][-1])
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, metrics, _ = step(state, chunk, lr)
        float(metrics[next(iter(metrics))][-1])
        dt = (time.perf_counter() - t0) / (n_chunks * scan_k)
        return batch / dt, dt

    step = jax.jit(ST.make_train_step(nets), donate_argnums=(0,))
    state, metrics, _ = step(state, dev_batch, lr)  # compile + warm
    float(next(iter(metrics.values())))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics, _ = step(state, dev_batch, lr)
    float(next(iter(metrics.values())))
    dt = (time.perf_counter() - t0) / steps
    return batch / dt, dt


def bench_torch_cpu() -> float:
    """Reference CoCosNet forward (netCorr + netG) on CPU torch."""
    import torch
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    import reference_harness as RH
    RH.load_reference()
    from models.networks.correspondence import NoVGGCorrespondence
    from models.networks.generator import SPADEGenerator

    topt = RH.make_opt(ngf=64, label_nc=150, semantic_nc=151, crop_size=256,
                       match_kernel=3, batchSize=CPU_BATCH)
    torch.manual_seed(0)
    with torch.no_grad():
        corr = NoVGGCorrespondence(topt).eval()
        gen = SPADEGenerator(topt).eval()
        rs = np.random.RandomState(0)
        ref = torch.from_numpy(
            rs.rand(CPU_BATCH, 3, 256, 256).astype(np.float32) * 2 - 1)
        sem = torch.zeros(CPU_BATCH, 151, 256, 256)
        lab = torch.from_numpy(rs.randint(0, 151, (CPU_BATCH, 1, 256, 256)))
        sem.scatter_(1, lab, 1.0)
        ref_sem = torch.roll(sem, 7, dims=2)

        def forward():
            out = corr(ref, None, sem, ref_sem)
            cbn = torch.cat([out["warp_out"], sem], dim=1)
            return gen(sem, warp_out=cbn)

        times = []
        for _ in range(CPU_STEPS):
            t0 = time.perf_counter()
            forward()
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
    return CPU_BATCH / dt


def bench_latency_p50() -> float:
    """p50 per-image latency: batch-1 inference, one dispatch per image
    (BASELINE.json's secondary metric)."""
    import jax
    import jax.numpy as jnp
    from cocosnet_tpu import pix2pix as P

    opt = _opt().replace(batchSize=1)
    nets = P.Pix2PixNets(opt)
    base = {k: (v[:1] if hasattr(v, "ndim") else v)
            for k, v in _batch(opt).items()}
    batch0 = {k: jax.device_put(v) for k, v in base.items()}
    variables = nets.init_all(jax.random.PRNGKey(0), batch0)
    variables = {k: v for k, v in variables.items() if k in ("gen", "corr")}

    @jax.jit
    def step(variables, batch):
        data = P.preprocess_input(opt, batch)
        out = P.inference(nets, variables, data)
        return jnp.sum(out["fake_image"])

    batches = []
    for i in range(4):
        b = dict(base)
        b["ref"] = b["ref"] + np.float32(i + 1) * 1e-3
        batches.append({k: jax.device_put(v) for k, v in b.items()})
    float(step(variables, batches[0]))
    times = []
    for i in range(11):
        t0 = time.perf_counter()
        float(step(variables, batches[i % 4]))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _probe_device(timeout_s: int = 180) -> bool:
    """True when a JAX device initializes within timeout_s, probed in a
    SUBPROCESS: when the axon tunnel is down, backend init hangs
    indefinitely inside the PJRT plugin (uninterruptible C call), so an
    in-process timeout cannot help. A hung probe is killed and the bench
    fails fast with a diagnostic JSON line instead of stalling the driver."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend(), len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    from cocosnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if not _probe_device():
        print(json.dumps({
            "metric": "ade20k_256px_exemplar_translation_inference",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "device backend did not initialize within 180s "
                     "(axon tunnel down?) — bench aborted instead of hanging",
        }))
        sys.exit(2)
    tpu_ips = bench_tpu()
    try:
        p50 = bench_latency_p50()
    except Exception as e:
        print(f"latency bench failed: {e}", file=sys.stderr)
        p50 = None
    train_ips = train_spb = train_batch = None
    for b in (8, 4):  # largest per-chip batch that fits, then fallback
        try:
            train_ips, train_spb = bench_train(batch=b)
            train_batch = b
            break
        except Exception as e:
            print(f"train bench (batch {b}) failed: {e}", file=sys.stderr)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cpu_baseline.json")
    cpu_ips = None
    if os.path.exists(cache):
        try:
            cpu_ips = json.load(open(cache))["torch_cpu_images_per_sec"]
        except Exception:
            cpu_ips = None
    if cpu_ips is None:
        try:
            cpu_ips = bench_torch_cpu()
            with open(cache, "w") as f:
                json.dump({"torch_cpu_images_per_sec": cpu_ips}, f)
        except Exception as e:
            print(f"torch-cpu baseline failed: {e}", file=sys.stderr)
            cpu_ips = float("nan")

    details = {
        "images_per_sec_chip": round(tpu_ips, 2),
        "p50_single_image_latency_ms": (round(p50 * 1e3, 1)
                                        if p50 is not None else None),
        "train_images_per_sec_chip": (round(train_ips, 2)
                                      if train_ips is not None else None),
        "train_sec_per_step": (round(train_spb, 3)
                               if train_spb is not None else None),
        "train_batch_per_chip": train_batch,
        "torch_cpu_images_per_sec": (round(cpu_ips, 4)
                                     if cpu_ips == cpu_ips else None),
        "config": "ade20k 256px batch 6, --use_attention --maskmix "
                  "--warp_mask_losstype direct --PONO --PONO_C",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps(details), file=sys.stderr)

    print(json.dumps({
        "metric": "ade20k_256px_exemplar_translation_inference",
        "value": round(tpu_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(tpu_ips / cpu_ips, 2) if cpu_ips == cpu_ips
        else None,
    }))


if __name__ == "__main__":
    main()
