#!/usr/bin/env python
# coding: utf-8
"""Training script (reference train.py CLI surface).

usage: train.py [options]

options:
    --data-root=<dir>            Directory containing preprocessed features.
    --checkpoint-dir=<dir>       Where to save checkpoints [default: checkpoints].
    --hparams=<params>           Hyper parameters [default: ].
    --preset=<json>              Path of preset parameters (json).
    --checkpoint=<path>          Restore model from checkpoint path if given.
    --checkpoint-seq2seq=<path>  Restore seq2seq model from checkpoint path.
    --checkpoint-postnet=<path>  Restore postnet model from checkpoint path.
    --train-seq2seq-only         Train only seq2seq model.
    --train-postnet-only         Train only postnet model.
    --restore-parts=<path>       Restore part of the model.
    --log-event-path=<name>      Log event path.
    --reset-optimizer            Reset optimizer.
    --load-embedding=<path>      Load embedding from checkpoint.
    --speaker-id=<N>             Use specific speaker of data.
    -h, --help                   Show this help message and exit
"""
import argparse
import os
import time
from datetime import datetime
from os.path import join

import numpy as np
import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu.hparams import hparams, hparams_debug_string
from deepvoice3_pytorch_tpu import frontend as frontend_pkg
from deepvoice3_pytorch_tpu.model_builder import build_model
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.training import (trainer, dataset,
                                             checkpoint as ckpt)
from deepvoice3_pytorch_tpu.parallel import mesh as mesh_lib
from deepvoice3_pytorch_tpu.utils import profiling
from deepvoice3_pytorch_tpu.synthesis import tts_batch


def save_states(global_step, writer, outputs, batch, checkpoint_dir, ap):
    """Alignment/spectrogram artifacts (reference train.py:439-534)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from matplotlib import cm

    mel_outputs, linear_outputs, attn, done_hat = outputs
    idx = min(1, len(batch["x"]) - 1)

    def plot_alignment(alignment, path):
        fig, ax = plt.subplots()
        im = ax.imshow(alignment, aspect='auto', origin='lower',
                       interpolation='none')
        fig.colorbar(im, ax=ax)
        plt.xlabel('Decoder timestep')
        plt.ylabel('Encoder timestep')
        plt.tight_layout()
        plt.savefig(path, format='png')
        plt.close()

    attn = np.asarray(attn)
    for i, alignment in enumerate(attn):
        path = join(checkpoint_dir,
                    "step%09d_layer_%d_alignment.png" % (global_step, i))
        plot_alignment(alignment[idx], path)
        if writer is not None:
            tag = "alignment_layer{}".format(i + 1)
            writer.add_image(
                tag, np.uint8(cm.viridis(alignment[idx]) * 255),
                global_step, dataformats="HWC")
    path = join(checkpoint_dir, "step%09d_alignment.png" % global_step)
    plot_alignment(attn.mean(0)[idx], path)

    def spec_image(spec):
        """Normalized spectrogram -> uint8 RGBA image (reference
        train.py:372-376)."""
        s = np.flip(np.asarray(spec).T, axis=0)
        s = np.clip(s, 0.0, 1.0)
        return np.uint8(cm.magma(s) * 255)

    if writer is not None:
        writer.add_image("predicted_mel_spectrogram",
                         spec_image(mel_outputs[idx]), global_step,
                         dataformats="HWC")
        writer.add_image("target_mel_spectrogram",
                         spec_image(batch["mel"][idx]), global_step,
                         dataformats="HWC")

    if linear_outputs is not None:
        linear_output = np.asarray(linear_outputs[idx])
        if writer is not None:
            writer.add_image("predicted_linear_spectrogram",
                             spec_image(linear_output), global_step,
                             dataformats="HWC")
            writer.add_image("target_linear_spectrogram",
                             spec_image(batch["y"][idx]), global_step,
                             dataformats="HWC")
        wav = ap.inv_spectrogram(linear_output.T)
        path = join(checkpoint_dir, "step%09d_predicted.wav" % global_step)
        ap.save_wav(wav, path)
        if writer is not None:
            try:
                writer.add_audio("predicted_audio", wav[None, :],
                                 global_step, sample_rate=ap.sample_rate)
            except Exception:
                pass


def eval_model(global_step, writer, params, cfg, ap, _frontend,
               checkpoint_dir, ismultispeaker, n_speakers, fused=None):
    """Synthesize fixed eval sentences (reference train.py:379-436)."""
    # A small eval set spanning the failure modes worth listening for:
    # numbers/abbreviations (cleaner path), long clauses (attention drift),
    # short imperatives (early done-flag), and question intonation.
    texts = [
        "The quick brown fox jumps over the lazy dog.",
        "In 1876, Alexander Graham Bell was awarded a patent for the telephone.",
        "Synthesis quality depends on attention staying monotonic across long, winding sentences such as this one.",
        "Dr. Smith owes the bank twelve hundred dollars and fifty cents.",
        "Stop right there.",
        "Could machines ever learn to speak with genuine feeling?",
    ]
    eval_dir = join(checkpoint_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    speaker_ids = [None] if not ismultispeaker else [0, 1, n_speakers - 1]
    for speaker_id in speaker_ids:
        spk = None if speaker_id is None else [speaker_id] * len(texts)
        try:
            results = tts_batch(params, cfg, ap, _frontend, texts, p=0,
                                speaker_ids=spk, max_decoder_steps=500,
                                fused=fused)
        except Exception as e:
            print("eval_model failed:", e)
            return
        for i, res in enumerate(results):
            tag = "eval_{}_{}".format(
                i, speaker_id if speaker_id is not None else "single")
            path = join(eval_dir,
                        "step%09d_%s.wav" % (global_step, tag))
            ap.save_wav(res["waveform"], path)
            if writer is not None:
                try:
                    writer.add_audio(tag, res["waveform"][None, :],
                                     global_step,
                                     sample_rate=ap.sample_rate)
                except Exception:
                    pass


def main():
    # honor JAX_PLATFORMS even when a site hook pre-registered a platform
    # (e.g. JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=N to
    # exercise --mesh-model on a virtual CPU mesh); if the hook already
    # *initialized* a backend, it must be cleared too (same dance as
    # tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        try:
            from jax.extend import backend as _jax_backend
            _jax_backend.clear_backends()
        except Exception:
            pass

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--checkpoint-seq2seq", type=str, default=None)
    parser.add_argument("--checkpoint-postnet", type=str, default=None)
    parser.add_argument("--train-seq2seq-only", action="store_true")
    parser.add_argument("--train-postnet-only", action="store_true")
    parser.add_argument("--restore-parts", type=str, default=None)
    parser.add_argument("--async-checkpoint", action="store_true",
                        help="Write periodic checkpoints from a background "
                        "thread (HBM snapshot, zero step-loop stall). The "
                        "right default on PCIe-attached hosts; off here "
                        "because the dev harness's shared device link makes "
                        "concurrent bulk fetch + step dispatch net-negative "
                        "(tools/async_ckpt_probe.py, DESIGN.md)")
    parser.add_argument("--log-event-path", type=str, default=None)
    parser.add_argument("--reset-optimizer", action="store_true")
    parser.add_argument("--load-embedding", type=str, default=None)
    parser.add_argument("--speaker-id", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None,
                        help="Stop after N steps (default: nepochs epochs)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace to this dir")
    parser.add_argument("--profile-start", type=int, default=10,
                        help="First step of the profiler trace window")
    parser.add_argument("--profile-steps", type=int, default=5,
                        help="Number of steps to trace")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="Devices on the 'model' mesh axis: out-channel "
                             "tensor parallelism + sequence parallelism "
                             "(frame axis) on those ranks; the rest of the "
                             "devices form the data-parallel axis")
    args = parser.parse_args()

    if args.preset is not None:
        with open(args.preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(args.hparams)
    assert hparams.name == "deepvoice3"
    print(hparams_debug_string())

    # persistent compilation cache: with length-bucketed batches the train
    # step compiles once per bucket shape — cache them across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # rbg PRNG for dropout noise: measured 24% faster train step on v5e
    # than the default threefry (which burns VPU cycles every layer), and
    # the recommended implementation under sharding. Only dropout sampling
    # changes; override with DV3_PRNG_IMPL=threefry2x32 to reproduce old
    # noise streams exactly.
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("DV3_PRNG_IMPL", "rbg"))

    train_seq2seq = not args.train_postnet_only
    train_postnet = not args.train_seq2seq_only
    assert train_seq2seq or train_postnet
    if not train_seq2seq and hparams.use_decoder_state_for_postnet_input:
        # the converter's input dim is decoder_channels // r in this mode
        # (reference builder.py:71-74), so ground-truth mel cannot feed it —
        # the reference fails identically, just with an opaque shape error
        raise SystemExit(
            "--train-postnet-only requires "
            "use_decoder_state_for_postnet_input=false: with it on, the "
            "converter consumes decoder states, which postnet-only training "
            "has no way to produce. Override with "
            "--hparams=use_decoder_state_for_postnet_input=false (the "
            "seq2seq half must have been trained the same way).")

    _frontend = frontend_pkg.get_frontend(hparams.frontend)
    ap = AudioProcessor(hparams)

    data_root = args.data_root or join(os.path.dirname(__file__), "data",
                                       "ljspeech")
    dataset.check_dsp_stamp(data_root, hparams)
    ds = dataset.TTSDataset(data_root, _frontend,
                            hparams.replace_pronunciation_prob,
                            speaker_id=args.speaker_id)
    sampler = dataset.SimilarTimeLengthSampler(
        ds.meta.frame_lengths, batch_size=hparams.batch_size)
    loader = dataset.DataLoader(
        ds, sampler, r=hparams.outputs_per_step,
        downsample_step=hparams.downsample_step,
        length_bucket_step=hparams.length_bucket_step,
        frame_bucket_step=hparams.frame_bucket_step,
        max_positions=hparams.max_positions)

    cfg, params = build_model(hparams, _frontend.n_vocab)

    lc = trainer.loss_config_from_hparams(hparams)._replace(
        train_seq2seq=train_seq2seq, train_postnet=train_postnet)
    lr_fn = trainer.make_lr_fn(hparams)
    optimizer = trainer.make_optimizer(hparams, lr_fn)
    mask = trainer.trainable_mask(params, cfg, train_seq2seq=train_seq2seq,
                                  train_postnet=train_postnet)

    global_step, global_epoch = 0, 0
    opt_state = None
    if args.checkpoint is not None:
        params, opt_state, global_step, global_epoch = ckpt.load_checkpoint(
            args.checkpoint, params, optimizer.init(params),
            reset_optimizer=args.reset_optimizer)
    if args.checkpoint_seq2seq is not None:
        params = ckpt.restore_parts(args.checkpoint_seq2seq, params)
    if args.checkpoint_postnet is not None:
        params = ckpt.restore_parts(args.checkpoint_postnet, params)
    if args.restore_parts is not None:
        params = ckpt.restore_parts(args.restore_parts, params)
    if args.load_embedding is not None:
        params = ckpt.load_embedding(args.load_embedding, params)

    # dp (x tp/sp with --mesh-model>1) mesh over all local devices
    mesh = mesh_lib.make_mesh(n_model=args.mesh_model)
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    n_model = mesh.shape[mesh_lib.MODEL_AXIS]
    print("Mesh: %s (data=%d, model=%d)" % (mesh.shape, n_data, n_model))
    params = mesh_lib.shard_params(params, mesh, tp=n_model > 1)

    step_fn = trainer.make_train_step(
        cfg, lc, optimizer, mask,
        compute_dtype=getattr(hparams, "compute_dtype", "float32"),
        seq_sharding=mesh_lib.seq_sharding(mesh) if n_model > 1 else None)
    state = trainer.TrainState(
        params, opt_state if opt_state is not None
        else optimizer.init(params), jnp.int32(global_step))

    # A writer is always created (reference train.py:1000-1006 does the
    # same); --log-event-path only selects the directory.
    writer = None
    try:
        from tensorboardX import SummaryWriter
        log_path = args.log_event_path or "log/run-test%s" % (
            datetime.now().strftime("%Y%m%d%H%M%S"))
        writer = SummaryWriter(log_path)
        print("TensorBoard event log path: %s" % log_path)
    except ImportError:
        pass

    rng = jax.random.PRNGKey(1234)
    ckpt_interval = hparams.checkpoint_interval
    eval_interval = hparams.eval_interval
    os.makedirs(args.checkpoint_dir, exist_ok=True)

    step_timer = profiling.StepTimer()
    tracer = profiling.TraceWindow(args.profile_dir, args.profile_start,
                                   args.profile_steps)

    from deepvoice3_pytorch_tpu.builder import model_forward

    @jax.jit
    def _fwd_for_states(params, x, mel, tp, fp, il, spk):
        return model_forward(params, cfg, x, mel, speaker_ids=spk,
                             text_positions=tp, frame_positions=fp,
                             input_lengths=il)

    def _save_states(step, batch):
        # jax.jit treats a None argument as an empty pytree, so the same
        # compiled entry covers single- and multi-speaker batches
        outputs = _fwd_for_states(
            state.params, batch["x"], batch["mel"], batch["text_positions"],
            batch["frame_positions"], batch["input_lengths"],
            batch.get("speaker_ids"))
        save_states(step, writer, outputs, batch, args.checkpoint_dir, ap)

    def device_batches(host_batches):
        """Double-buffered host->device pipeline: device_put dispatches the
        NEXT batch's transfer asynchronously while the current train step
        runs, hiding the PCIe/ICI copy behind compute (at 7 ms/step the
        transfer is the larger cost on slow links)."""
        pending = None
        for batch in host_batches:
            if len(batch["x"]) % n_data != 0:
                continue  # ragged tail batch cannot shard evenly
            placed = mesh_lib.shard_batch(mesh, batch, sp=n_model > 1)
            if pending is not None:
                yield pending
            pending = placed
        if pending is not None:
            yield pending

    print("Starting training (%d utterances, batch %d)"
          % (len(ds), hparams.batch_size))
    try:
        while global_epoch < hparams.nepochs:
            running = []
            t_epoch = time.time()
            for batch in device_batches(loader):
                rng, step_rng = jax.random.split(rng)
                tracer.maybe_start(global_step)
                state, metrics = step_fn(state, batch, step_rng)
                global_step += 1
                step_timer.tick()
                tracer.maybe_stop(global_step)

                if global_step % 50 == 0 or global_step < 5:
                    m = {k: float(v) for k, v in metrics.items()}
                    perf = step_timer.report(writer, global_step)
                    print("step %d | loss %.4f | %s%s"
                          % (global_step, m["loss"],
                             " ".join("%s %.4f" % (k, v)
                                      for k, v in sorted(m.items())
                                      if k != "loss"),
                             (" | " + perf) if perf else ""))
                if writer is not None and global_step % 10 == 0:
                    for k, v in metrics.items():
                        writer.add_scalar(k, float(v), global_step)
                    writer.add_scalar("learning rate",
                                      float(lr_fn(global_step)),
                                      global_step)
                # keep the device scalar — float() here would fetch the loss
                # every step, serializing host dispatch on a device roundtrip;
                # epoch-end materializes the whole list at once
                running.append(metrics["loss"])

                if global_step > 0 and global_step % ckpt_interval == 0:
                    try:
                        _save_states(global_step, batch)
                    except Exception as e:
                        print("save_states failed:", e)
                    # --async-checkpoint: HBM snapshot now, host fetch +
                    # write on the background writer thread — the step loop
                    # never stalls on the device->host checkpoint transfer
                    ckpt.save_checkpoint(
                        args.checkpoint_dir, state.params, state.opt_state,
                        global_step, global_epoch,
                        train_seq2seq=train_seq2seq,
                        train_postnet=train_postnet,
                        save_optimizer_state=hparams.save_optimizer_state,
                        async_save=args.async_checkpoint)
                if global_step > 0 and global_step % eval_interval == 0:
                    # tp-sharded params cannot enter the single-program
                    # Pallas decode kernel; force the scan path for eval
                    eval_model(global_step, writer, state.params, cfg, ap,
                               _frontend, args.checkpoint_dir,
                               cfg.n_speakers > 1, cfg.n_speakers,
                               fused=False if n_model > 1 else None)
                if args.max_steps and global_step >= args.max_steps:
                    raise KeyboardInterrupt
            global_epoch += 1
            epoch_loss = float(np.mean([float(x) for x in running])) \
                if running else float("nan")
            print("epoch %d done in %.1fs | avg loss %.4f"
                  % (global_epoch, time.time() - t_epoch, epoch_loss))
            if writer is not None and running:
                writer.add_scalar("loss (per epoch)", epoch_loss,
                                  global_epoch)
    except KeyboardInterrupt:
        print("Interrupted — saving checkpoint")
    finally:
        tracer.close()
        try:
            ckpt.wait_pending_saves()
        except RuntimeError as e:
            print("background checkpoint save failed:", e)
        ckpt.save_checkpoint(
            args.checkpoint_dir, state.params, state.opt_state, global_step,
            global_epoch, train_seq2seq=train_seq2seq,
            train_postnet=train_postnet,
            save_optimizer_state=hparams.save_optimizer_state)
        print("Saved final checkpoint at step %d" % global_step)


if __name__ == "__main__":
    main()
