#!/usr/bin/env python
# coding: utf-8
"""Synthesize waveforms from a trained model (reference synthesis.py CLI).

usage: synthesis.py [options] <checkpoint> <text_list_file> <dst_dir>

options:
    --hparams=<params>                Hyper parameters [default: ].
    --preset=<json>                   Path of preset parameters (json).
    --checkpoint-seq2seq=<path>       Load seq2seq model from checkpoint.
    --checkpoint-postnet=<path>       Load postnet model from checkpoint.
    --file-name-suffix=<s>            File name suffix [default: ].
    --max-decoder-steps=<N>           Max decoder steps [default: 500].
    --replace_pronunciation_prob=<N>  Probability [default: 0.0].
    --speaker_id=<id>                 Speaker ID (multi-speaker model).
    --batch-size=<N>                  Synthesize N sentences at once [default: 1].
    --stream                          Streaming pipeline (prints first-chunk latency).
    --output-html                     Output html for blog post.
    -h, --help                        Show help message.
"""
import argparse
import os
from os.path import basename, join, splitext

import numpy as np

from deepvoice3_pytorch_tpu.hparams import hparams, hparams_debug_string
from deepvoice3_pytorch_tpu import frontend as frontend_pkg
from deepvoice3_pytorch_tpu.model_builder import build_model
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.synthesis import tts_batch
from deepvoice3_pytorch_tpu.training import checkpoint as ckpt


def plot_alignment(alignment, path, info=None):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    fig, ax = plt.subplots()
    im = ax.imshow(alignment, aspect='auto', origin='lower',
                   interpolation='none')
    fig.colorbar(im, ax=ax)
    xlabel = 'Decoder timestep'
    if info is not None:
        xlabel += '\n\n' + info
    plt.xlabel(xlabel)
    plt.ylabel('Encoder timestep')
    plt.tight_layout()
    plt.savefig(path, format='png')
    plt.close()


def _stream_batch(params, cfg, ap, frontend_mod, texts, args, spk):
    """--stream mode: run the streaming pipeline, report the first-chunk
    latency, and assemble per-utterance waveforms trimmed to the decoded
    lengths. Alignments arrive with the final chunk (deferred fetch)."""
    import time

    from deepvoice3_pytorch_tpu import streaming

    gen = streaming.tts_stream(params, cfg, ap, frontend_mod, texts,
                               p=args.replace_pronunciation_prob,
                               speaker_ids=spk,
                               max_decoder_steps=args.max_decoder_steps,
                               emit_alignment=True)
    t0 = time.time()
    chunks = []
    for i, c in enumerate(gen):
        if i == 0:
            print("  first audio after %.0f ms (%.2f s of audio)"
                  % ((time.time() - t0) * 1e3,
                     c["audio"].shape[1] / ap.sample_rate))
        chunks.append(c)
    audio = np.concatenate([c["audio"] for c in chunks], axis=1)
    dec = chunks[-1]["decoded_steps"]
    align = chunks[-1]["alignment"]
    results = []
    for i in range(len(texts)):
        n = streaming.decoded_samples(cfg, ap, dec[i])
        results.append({"waveform": audio[i, :n],
                        "alignment": align[i, :int(dec[i])]})
    return results


def main():
    # honor JAX_PLATFORMS even when a site hook pre-registered a platform
    # (clearing any backend the hook already initialized, as conftest does)
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        try:
            from jax.extend import backend as _jax_backend
            _jax_backend.clear_backends()
        except Exception:
            pass

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("text_list_file")
    parser.add_argument("dst_dir")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    parser.add_argument("--checkpoint-seq2seq", type=str, default=None)
    parser.add_argument("--checkpoint-postnet", type=str, default=None)
    parser.add_argument("--file-name-suffix", type=str, default="")
    parser.add_argument("--max-decoder-steps", type=int, default=500)
    parser.add_argument("--replace_pronunciation_prob", type=float,
                        default=0.0)
    parser.add_argument("--speaker_id", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--fused", action="store_true", default=None,
                        help="decode with the whole-loop Pallas kernel "
                             "(default: auto — on for TPU)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard each batch over all visible chips "
                             "(params replicated); composes with --fused "
                             "(shard_map runs the kernel per device)")
    parser.add_argument("--stream", action="store_true",
                        help="synthesize with the streaming pipeline "
                             "(deepvoice3_pytorch_tpu/streaming.py): audio "
                             "is produced chunk-by-chunk and the first-"
                             "chunk latency is printed per batch")
    parser.add_argument("--output-html", action="store_true")
    args = parser.parse_args()

    if args.preset is not None:
        with open(args.preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(args.hparams)
    assert hparams.name == "deepvoice3"
    print(hparams_debug_string())

    _frontend = frontend_pkg.get_frontend(hparams.frontend)
    cfg, params = build_model(hparams, _frontend.n_vocab)

    if args.checkpoint_seq2seq and args.checkpoint_postnet:
        params = ckpt.restore_parts(args.checkpoint_seq2seq, params)
        params = ckpt.restore_parts(args.checkpoint_postnet, params)
        checkpoint_name = splitext(basename(args.checkpoint_seq2seq))[0]
    else:
        params, _, _, _ = ckpt.load_checkpoint(args.checkpoint, params,
                                               reset_optimizer=True)
        checkpoint_name = splitext(basename(args.checkpoint))[0]

    ap = AudioProcessor(hparams)
    os.makedirs(args.dst_dir, exist_ok=True)

    mesh = None
    if args.data_parallel:
        from deepvoice3_pytorch_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(n_model=1)
        print("Data-parallel synthesis over mesh %s" % dict(mesh.shape))

    with open(args.text_list_file, "rb") as f:
        lines = [l.decode("utf-8").strip() for l in f if l.strip()]

    html_rows = []
    for s in range(0, len(lines), args.batch_size):
        texts = lines[s:s + args.batch_size]
        spk = None if args.speaker_id is None \
            else [args.speaker_id] * len(texts)
        if args.stream:
            assert mesh is None, "--stream does not compose with " \
                "--data-parallel"
            results = _stream_batch(params, cfg, ap, _frontend, texts,
                                    args, spk)
        else:
            results = tts_batch(params, cfg, ap, _frontend, texts,
                                p=args.replace_pronunciation_prob,
                                speaker_ids=spk,
                                max_decoder_steps=args.max_decoder_steps,
                                fused=args.fused, mesh=mesh)
        for j, (text, res) in enumerate(zip(texts, results)):
            idx = s + j
            name = "{}_{}{}".format(idx, checkpoint_name,
                                    args.file_name_suffix)
            dst_wav_path = join(args.dst_dir, name + ".wav")
            dst_alignment_path = join(args.dst_dir,
                                      name + "_alignment.png")
            if "alignment" in res:
                plot_alignment(res["alignment"].T, dst_alignment_path,
                               info="{}, {}".format(
                                   hparams.builder,
                                   basename(args.checkpoint)))
            ap.save_wav(res["waveform"], dst_wav_path)
            # caption sidecar consumed by docs/build_gallery.py
            with open(join(args.dst_dir, name + ".txt"), "w",
                      encoding="utf-8") as f:
                f.write(text + "\n")
            print(idx, ": {}\n ({} chars, {} words)".format(
                text, len(text), len(text.split())))
            if args.output_html:
                html_rows.append(
                    "<figure>\n<figcaption>{}</figcaption>\n"
                    "<audio controls src=\"{}\"></audio>\n"
                    "<img src=\"{}\" width=\"480\">\n</figure>".format(
                        text.replace("<", "&lt;"),
                        basename(dst_wav_path),
                        basename(dst_alignment_path)))

    if args.output_html and html_rows:
        html = ("<!doctype html>\n<meta charset=\"utf-8\">\n"
                "<title>{0}</title>\n<h1>{0}</h1>\n{1}\n").format(
                    checkpoint_name, "\n".join(html_rows))
        html_path = join(args.dst_dir, "index.html")
        with open(html_path, "w", encoding="utf-8") as f:
            f.write(html)
        print("Wrote {}".format(html_path))

    print("Finished! Check out {} for generated audio samples.".format(
        args.dst_dir))


if __name__ == "__main__":
    main()
