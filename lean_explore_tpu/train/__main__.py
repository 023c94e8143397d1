"""Training CLI: ``python -m lean_explore_tpu.train``.

Contrastive fine-tuning of the embedder on (query, informalization) pairs
from a declaration store, with mesh sharding and orbax checkpointing.

    python -m lean_explore_tpu.train \
        --model-dir /models/Qwen3-Embedding-0.6B \
        --data-dir  ~/.lean_explore_tpu/cache/<version> \
        --mesh 4,2 --steps 1000 --checkpoint-dir /ckpts/run1
"""

import argparse
import logging
import time
from pathlib import Path

logger = logging.getLogger(__name__)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Contrastive embedder training.")
    parser.add_argument(
        "--model-dir",
        default=None,
        help="HF checkpoint to fine-tune; omit for random init (smoke runs).",
    )
    parser.add_argument(
        "--data-dir", required=True, help="Directory containing declarations.db."
    )
    parser.add_argument("--mesh", default=None, help="data,model mesh (e.g. 4,2).")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--learning-rate", type=float, default=1e-5)
    parser.add_argument("--query-max-length", type=int, default=64)
    parser.add_argument("--doc-max-length", type=int, default=256)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--checkpoint-every", type=int, default=200)
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    from lean_explore_tpu.util.logging import setup_logging
    from lean_explore_tpu.util.platform import honor_cpu_platform_request

    setup_logging(args.verbose)
    honor_cpu_platform_request()

    import jax
    import jax.numpy as jnp

    from lean_explore_tpu.models import DeclarationStore
    from lean_explore_tpu.models.qwen3 import Qwen3Config
    from lean_explore_tpu.models.tokenizer import load_tokenizer
    from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
    from lean_explore_tpu.train import (
        ContrastiveDataLoader,
        init_train_state,
        latest_checkpoint,
        make_optimizer,
        make_train_step,
        pairs_from_store,
        restore_checkpoint,
        save_checkpoint,
        shard_params,
    )

    devices = jax.devices()
    if args.mesh:
        shape = tuple(int(x) for x in args.mesh.split(","))
    else:
        shape = (len(devices), 1)
    mesh = make_mesh(shape, axis_names=TRAIN_AXES, devices=devices)
    logger.info("mesh %s over %s", shape, devices[0].platform)

    store = DeclarationStore(Path(args.data_dir) / "declarations.db")
    pairs = pairs_from_store(store)
    if len(pairs) < args.batch_size:
        raise SystemExit(
            f"only {len(pairs)} training pairs; need >= batch size "
            f"{args.batch_size}"
        )

    optimizer = make_optimizer(learning_rate=args.learning_rate)
    if args.model_dir:
        from lean_explore_tpu.models.hf_loader import load_params

        params, config = load_params(args.model_dir, dtype=jnp.float32)
        params = shard_params(params, mesh, config)
        from lean_explore_tpu.train.contrastive import commit_to_mesh

        opt_state = commit_to_mesh(jax.jit(optimizer.init)(params), mesh)
        tokenizer = load_tokenizer(args.model_dir)
    else:
        logger.warning("no --model-dir: random-init tiny config (smoke mode)")
        config = Qwen3Config.tiny()
        params, opt_state = init_train_state(
            config, mesh, optimizer, seed=args.seed
        )
        # Smoke mode still needs a tokenizer; data-dir may provide one.
        tokenizer = load_tokenizer(args.data_dir)

    start_step = 0
    if args.checkpoint_dir:
        found = latest_checkpoint(args.checkpoint_dir)
        if found:
            start_step, path = found
            restored = restore_checkpoint(
                path, {"params": params, "opt_state": opt_state}
            )
            params, opt_state = restored["params"], restored["opt_state"]
            logger.info("resumed from step %d", start_step)

    step_fn = make_train_step(config, mesh, optimizer)
    loader = ContrastiveDataLoader(
        tokenizer,
        pairs,
        batch_size=args.batch_size,
        query_max_length=args.query_max_length,
        doc_max_length=args.doc_max_length,
        seed=args.seed,
    )

    batches = iter(loader)
    t0 = time.perf_counter()
    for step in range(start_step + 1, args.steps + 1):
        params, opt_state, metrics = step_fn(params, opt_state, next(batches))
        if step % args.log_every == 0 or step == args.steps:
            rate = args.batch_size * args.log_every / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            logger.info(
                "step %d/%d loss %.4f acc %.3f (%.1f pairs/s)",
                step,
                args.steps,
                float(metrics["loss"]),
                float(metrics["accuracy"]),
                rate,
            )
        if args.checkpoint_dir and (
            step % args.checkpoint_every == 0 or step == args.steps
        ):
            save_checkpoint(args.checkpoint_dir, step, params, opt_state)
    logger.info("training complete at step %d", args.steps)


if __name__ == "__main__":
    main()
