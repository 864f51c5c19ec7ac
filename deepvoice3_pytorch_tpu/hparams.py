# coding: utf-8
"""Default hyperparameters — same keys/defaults as the reference hparams.py
(reference hparams.py:7-140) so its JSON presets load unchanged, plus
TPU-specific additions (griffin_lim_iters, mesh/batching knobs) at the end.
"""

from .config import HParams


def default_hparams():
    return HParams(
        name="deepvoice3",

        # Text:
        frontend='en',
        # Replace words with pronunciation with this probability.
        replace_pronunciation_prob=0.5,

        # Convenient model builder: [deepvoice3, deepvoice3_multispeaker, nyanko]
        builder="deepvoice3",

        n_speakers=1,
        speaker_embed_dim=16,

        # Audio:
        num_mels=80,
        fmin=125,
        fmax=7600,
        fft_size=1024,
        hop_size=256,
        sample_rate=22050,
        preemphasis=0.97,
        min_level_db=-100,
        ref_level_db=20,
        rescaling=False,
        rescaling_max=0.999,
        allow_clipping_in_normalization=True,

        # Model:
        downsample_step=4,   # must be 4 when builder="nyanko"
        outputs_per_step=1,  # must be 1 when builder="nyanko"
        embedding_weight_std=0.1,
        speaker_embedding_weight_std=0.01,
        padding_idx=0,
        max_positions=512,
        dropout=1 - 0.95,
        kernel_size=3,
        text_embed_dim=128,
        encoder_channels=256,
        decoder_channels=256,
        converter_channels=256,
        query_position_rate=1.0,
        key_position_rate=1.385,  # 2.37 for jsut
        key_projection=False,
        value_projection=False,
        use_memory_mask=True,
        trainable_positional_encodings=False,
        freeze_embedding=False,
        use_decoder_state_for_postnet_input=True,

        # Data loader
        pin_memory=True,   # compat no-op: CUDA pinned-host-memory knob; the
                           # TPU path has no equivalent (kept so reference
                           # presets parse unchanged)
        num_workers=2,     # compat no-op: torch DataLoader worker *processes*
                           # (reference train.py:965-968). The native C++
                           # batch loader instead reads one file per thread up
                           # to hardware concurrency (DataLoader num_workers=0
                           # default); mapping this knob onto read threads
                           # would throttle I/O to 2 threads per batch.

        # Loss
        masked_loss_weight=0.5,
        priority_freq=3000,
        priority_freq_weight=0.0,
        binary_divergence_weight=0.1,
        use_guided_attention=True,
        guided_attention_sigma=0.2,

        # Training:
        batch_size=16,
        adam_beta1=0.5,
        adam_beta2=0.9,
        adam_eps=1e-6,
        amsgrad=False,
        initial_learning_rate=5e-4,
        lr_schedule="noam_learning_rate_decay",
        lr_schedule_kwargs={},
        nepochs=2000,
        weight_decay=0.0,
        clip_thresh=0.1,

        # Save
        checkpoint_interval=10000,
        eval_interval=10000,
        save_optimizer_state=True,

        # Eval:
        force_monotonic_attention=True,
        window_ahead=3,
        window_backward=1,
        power=1.4,

        # json_meta mode only
        ignore_recognition_level=2,
        min_text=20,
        process_only_htk_aligned=False,

        # --- TPU-native additions (not in the reference) ---
        griffin_lim_iters=16,       # on-device phase retrieval iterations
                                    # (with the spsi phase init below, 16
                                    # iters matches zero-phase@30 quality on
                                    # the golden fixture — sc 0.144 vs lws
                                    # 0.159 — at ~half the vocoder cost;
                                    # sweep: tools/gl_iters_sweep.py)
        griffin_lim_phase_init="spsi",  # "spsi": per-bin interpolated-
                                    # frequency phase integration as the GL
                                    # starting point (dsp/stft.py
                                    # spsi_phase); "zero": classic |S| init
        griffin_lim_momentum=0.9,   # fast-GL acceleration; 0.9 is measured
                                    # best WITH the spsi init (sc 0.1394 vs
                                    # 0.1442 at 0.99 @16 iters — a good
                                    # start wants less extrapolation); the
                                    # classic zero-phase start prefers 0.99
        max_decoder_steps=500,      # static decode length bound
        length_bucket_step=32,      # pad text lengths to multiples (recompile guard)
        frame_bucket_step=64,       # pad decoder lengths to multiples
        mesh_data_axis=-1,          # -1: all local devices on the data axis
        compute_dtype="float32",    # "bfloat16": bf16 params/activations,
                                    # f32 softmax/loss/optimizer (trainer.py)
        stft_mode="lws",            # "lws": reference lws.stft conventions
                                    # (causal framing, PR-normalized
                                    # sqrt-Hann); "center": librosa-style
        phase_retrieval="gl",       # "gl" momentum Griffin-Lim (default) or
                                    # "lws" on-device local weighted sums
        griffin_lim_matmul_dtype="",  # "" = float32; "bfloat16" runs the GL
                                    # DFT matmuls with bf16 operands —
                                    # measured NEUTRAL on v5e
                                    # (tools/gl_bf16_probe.py), kept for
                                    # other TPU generations
        griffin_lim_carry_dtype="bfloat16",  # store the GL scan carry and
                                    # frames/x/f2 intermediates in bf16
                                    # (matmuls consume native-bf16 operands
                                    # with f32 accumulation; momentum/
                                    # magnitude projection stay f32):
                                    # 29.2 -> 24.5 ms at bench shapes on
                                    # v5e at equal-or-better golden-fixture
                                    # quality (tools/gl_bf16carry_probe.py).
                                    # "" = keep everything float32.
    )


hparams = default_hparams()


def hparams_debug_string(hp=None):
    values = (hp or hparams).values()
    lines = ['  %s: %s' % (name, values[name]) for name in sorted(values)]
    return 'Hyperparameters:\n' + '\n'.join(lines)
