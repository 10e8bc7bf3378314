"""Multi-chip dry run: the framework's three parallelism axes on a virtual mesh.

Run as ``python -m enhance_cb_whisper_tpu.parallel.dryrun N`` in a process
whose environment sets ``JAX_PLATFORMS=cpu`` and
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` *before* interpreter
start (``__graft_entry__.dryrun_multichip`` spawns exactly that subprocess).
XLA parses ``XLA_FLAGS`` once at first backend initialization; this
environment's ``sitecustomize`` initializes a backend at interpreter start
whenever ``PALLAS_AXON_POOL_IPS`` is set, so in-process env mutation is too
late — the round-1 driver gate failed on precisely this (MULTICHIP_r01).

Stages (mirroring the reference's parallelism story, SURVEY.md §2.7):
  1. FULL adversarial KWS training step (GRL discriminator + entropy +
     grad-accumulation scan) with the batch sharded over the ``data`` axis —
     the DP analogue of Lightning DDP (reference configs/train.yaml:4-7).
  2. Keyword-catalog scoring sharded over the ``model`` axis — the sharded
     replacement for the host group loop (reference cb_whisper.py:110-129).
  3. Tensor-parallel Whisper encoder forward (megatron-style param sharding)
     — the optional TP axis for large encoders.
  4. THE FLAGSHIP: batched longform biased decode (per-segment keyword
     spotting → prompt injection → beam search → timestamp-driven seek,
     reference pba_whisper.py:365-465) with the utterance batch sharded over
     ``data`` and the keyword catalog over ``model`` — token-identical to
     the single-device run (also asserted by tests/test_parallel.py).
  5. The same decode with the Whisper params tensor-parallel over ``model``.
  6. The packed (continuous-batching) serving scheduler on the mesh: a
     heterogeneous-length corpus streamed through ``data``-sharded slots —
     every launch keeps exactly ``slots`` rows, so the data axis always
     divides and no window falls back to the replicated straggler path.
"""

import sys

import numpy as np


def flagship_longform_stage(mesh, seed: int = 0, num_beams: int = 5,
                            tp: bool = False, packed: bool = False,
                            kv_int8: bool = False, xkv_int8: bool = False,
                            lang_detect: bool = False, kv_staging: int = 0):
    """Mesh-parallel batched longform CB-Whisper decode.

    Builds a tiny random Whisper + ResNet KWS + keyword catalog, runs the
    FULL longform loop (spotting → `<|startofprev|>` prompt → beam search →
    seek) twice — single-device, then with segments sharded over ``data``
    and the catalog over ``model`` — and returns both token outputs.  The
    caller asserts they are identical (GSPMD partitioning must not change
    the decode).

    With ``tp=True`` the Whisper params are additionally tensor-parallel
    over ``model`` (megatron column/row splits, heads and MLP hidden
    sharded) for the WHOLE decode — encoder, prefill, and the beam-search
    ``while_loop`` (self-attn KV cache and cross-attn KV inherit the head
    sharding through GSPMD propagation).  This is the memory lever for
    whisper-large-v3-scale serving (SURVEY.md §7 hard parts); correctness
    is pinned by token-identity with the single-device run."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from enhance_cb_whisper_tpu.catalog import KeywordCatalog
    from enhance_cb_whisper_tpu.decoding.generate import (
        GenerationOptions,
        WhisperGenerator,
    )
    from enhance_cb_whisper_tpu.models import ResNetConfig
    from enhance_cb_whisper_tpu.models.cb_whisper import CBWhisper, CBWhisperConfig
    from enhance_cb_whisper_tpu.models.kws import KWSModel
    from enhance_cb_whisper_tpu.models.whisper import (
        WhisperConfig,
        init_whisper_params,
    )
    from enhance_cb_whisper_tpu.parallel import shard_catalog

    nprng = np.random.default_rng(seed)
    wcfg = WhisperConfig(
        vocab_size=64, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=16, max_target_positions=24,
        decoder_start_token_id=3, eos_token_id=2, pad_token_id=0,
    )
    wparams = init_whisper_params(nprng, wcfg)
    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        # language auto-detection mode: per-row [sot] prefill over the
        # first window, argmax over this token set (decoding/generate.py)
        lang_token_ids=(40, 41, 42) if lang_detect else (),
        no_timestamps_token_id=50, prev_sot_token_id=49,
        eos_token_id=2, pad_token_id=0,
        suppress_tokens=(), begin_suppress_tokens=(),
        max_initial_timestamp_index=8, num_beams=num_beams,
        return_timestamps=True, condition_on_prev_tokens=True,
        max_target_positions=24,
    )

    tiny = ResNetConfig(
        num_channels=2, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )
    kws_model = KWSModel(tiny)
    kws_variables = kws_model.init(
        jax.random.PRNGKey(1), np.zeros((1, 2, 32, 48), np.float32)
    )
    n_kw = 8 * max(mesh.shape.get("model", 1), 1)
    stacks = [
        nprng.standard_normal((2, int(nprng.integers(2, 6)), 32)).astype(np.float32)
        for _ in range(n_kw)
    ]
    stacks = [s / np.linalg.norm(s, axis=-1, keepdims=True) for s in stacks]
    catalog = KeywordCatalog.from_arrays(
        [f"kw{i}" for i in range(n_kw)], stacks, group_size=8
    )

    def prompt_ids_fn(text):
        return [49] + [20 + (ord(c) % 28) for c in text][:6]

    batch = max(2, mesh.shape.get("data", 2))
    total = wcfg.max_source_positions * 2 * 2 + 20  # ~2.3 segments longform
    mels = nprng.standard_normal((batch, 8, total), dtype=np.float32)
    # packed mode: a heterogeneous-length corpus of 2x the slot count —
    # every launch still has EXACTLY `batch` rows (finished slots refill),
    # so the `data` axis always divides and nothing falls back to the
    # replicated straggler path below
    mels_list = [
        nprng.standard_normal((1, 8, total + (i % 4) * 17 - 25), np.float32)
        for i in range(2 * batch)
    ]

    def build():
        return CBWhisper(
            kv_cache_int8=kv_int8,
            cross_kv_int8=xkv_int8,
            kv_staging=kv_staging,
            config=CBWhisperConfig(
                kws_features_size=(32, 48), keywords_per_group=8,
            ),
            whisper_config=wcfg,
            whisper_params=wparams,
            kws_model=kws_model,
            kws_variables=kws_variables,
            catalog=catalog,
            generation_options=opts,
            prompt_ids_fn=prompt_ids_fn,
            decode_fn=lambda toks: " ".join(map(str, toks)),
            kws_layer_slice=(0, 2),
        )

    def run(cb):
        if packed:
            out = dict(
                cb.generator.generate_packed(
                    ((m, None) for m in mels_list), opts, slots=batch,
                    keyword_spotting=cb.keyword_spotting,
                    encode_spot=cb._encode_spot_hook(),
                    return_segments=True,
                )
            )
            return {
                "sequences": [
                    np.asarray(out[i]["sequences"])
                    for i in range(len(mels_list))
                ],
                "segments": [out[i]["segments"] for i in range(len(mels_list))],
            }
        return cb.generator.generate(
            mels, opts, keyword_spotting=cb.keyword_spotting,
            return_segments=True, encode_spot=cb._encode_spot_hook(),
        )

    # single-device reference
    ref = run(build())

    # mesh-parallel: utterances over `data`, catalog over `model`
    with mesh:
        cb = build()
        cb._ensure_catalog()
        cb._catalog_dev = shard_catalog(cb._catalog_dev, mesh, axis="model")
        if tp:
            from enhance_cb_whisper_tpu.parallel.sharding import (
                device_put_with_specs,
                whisper_param_sharding,
            )

            gen_tp = cb.generator
            gen_tp.params = device_put_with_specs(
                gen_tp.params, whisper_param_sharding(gen_tp.params, mesh)
            )
        data_sh = NamedSharding(mesh, P("data"))
        n_data = mesh.shape["data"]

        def put(mel):
            # The longform driver re-buckets the batch to the ACTIVE
            # utterances; once stragglers shrink a bucket below the data
            # axis it no longer divides evenly, so tail buckets stay
            # replicated (what a serving system does with remainders).
            if mel.shape[0] % n_data == 0:
                return jax.device_put(mel, data_sh)
            return mel

        gen = cb.generator
        orig_encode = gen._encode
        gen._encode = lambda mel: orig_encode(put(mel))
        orig_stack_enc = cb._kws_stack_enc
        cb._kws_stack_enc = lambda mel: orig_stack_enc(put(mel))
        got = run(cb)

    return ref, got


def main(n_devices: int) -> None:
    import jax

    assert len(jax.devices()) == n_devices, (
        f"need {n_devices} devices, backend has {len(jax.devices())} "
        f"({jax.default_backend()}); XLA_FLAGS must set "
        f"xla_force_host_platform_device_count before jax initializes"
    )

    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.catalog import (
        KeywordCatalog,
        device_put_catalog,
        make_catalog_score_fn,
    )
    from enhance_cb_whisper_tpu.models import ResNetConfig
    from enhance_cb_whisper_tpu.models.kws import KWSModel
    from enhance_cb_whisper_tpu.models.whisper import (
        WhisperConfig,
        encoder_forward,
        init_whisper_params,
    )
    from enhance_cb_whisper_tpu.ops.resize import resize_matrix
    from enhance_cb_whisper_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_catalog,
        whisper_param_sharding,
    )
    from enhance_cb_whisper_tpu.parallel.sharding import device_put_with_specs
    from enhance_cb_whisper_tpu.train.kws_train import (
        KWSTrainConfig,
        init_train_state,
        make_train_step,
    )

    model_axis = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh({"data": n_devices // model_axis, "model": model_axis})
    print(f"mesh: {mesh.shape}")

    # ---- 1. FULL training step (adversarial + entropy + grad accumulation),
    #         batch sharded over the data axis (DP)
    tiny = ResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )
    config = KWSTrainConfig(
        adversarial_training=True, entropy=True, num_domains=4,
        accumulate_grad_batches=2,
    )
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, config, tiny, (3, 32, 32))
    step = make_train_step(config, kws, disc, tx)

    nprng = np.random.default_rng(0)
    batch_size = max(8, 2 * n_devices)
    batch = {
        "features": jnp.asarray(
            nprng.standard_normal((batch_size, 3, 32, 32), dtype=np.float32)
        ),
        "labels": jnp.asarray(nprng.integers(0, 2, batch_size)),
        "domain": jnp.asarray(nprng.integers(0, 4, batch_size)),
    }
    with mesh:
        sharded_step = make_sharded_train_step(step, mesh)
        params, stats, opt_state, metrics = sharded_step(
            state.params, state.batch_stats, state.opt_state, batch, rng, 0.1, 0.5
        )
        print("dp train step ok:", {k: float(v) for k, v in metrics.items()})

        # ---- 2. keyword-catalog scoring sharded over the model axis
        stacks = [
            nprng.standard_normal((3, int(nprng.integers(2, 6)), 16)).astype(np.float32)
            for _ in range(8 * model_axis)
        ]
        catalog = KeywordCatalog.from_arrays(
            [f"k{i}" for i in range(len(stacks))], stacks, group_size=8
        )
        kws_eval = KWSModel(tiny)
        kv = kws_eval.init(jax.random.PRNGKey(1), np.zeros((1, 3, 32, 48), np.float32))

        def kws_apply(v, x):
            return kws_eval.apply(v, x).logits

        score = make_catalog_score_fn(kws_apply, out_size=(32, 48), chunk=8)
        cat_dev = shard_catalog(device_put_catalog(catalog, out_h=32, chunk=8), mesh)
        utt = nprng.standard_normal((3, 20, 16)).astype(np.float32)
        w = jnp.asarray(resize_matrix(20, 48, antialias=False))
        probs, _ = score(kv, cat_dev, jnp.asarray(utt), w)
        print("sharded catalog scoring ok:", np.asarray(probs).shape)

        # ---- 2b. two-stage cascade scoring on the model-sharded projected
        #          catalog (paper-2 open-vocab path): top_k over the sharded
        #          MaxSim proxy + shortlist row gather + scatter, all under
        #          GSPMD — parity vs the unsharded cascade
        from enhance_cb_whisper_tpu.efficient_kws import (
            EfficientKWSConfig,
            EfficientKWSModel,
        )
        from enhance_cb_whisper_tpu.efficient_kws.catalog import (
            make_cascade_score_fn,
            project_catalog,
        )

        ecfg = EfficientKWSConfig(
            n_layers=2, embedding_dim=16, learn_features=True, proj_mlp=True,
            proj_mlp_units=8, resnet_version="resnet-18",
        )
        emodel = EfficientKWSModel(ecfg)
        egroups = [
            {
                "kwd": nprng.standard_normal((4, 2, 16, 16), dtype=np.float32),
                "kwd_mask": np.ones((4, 2, 16), np.float32),
                "mask": np.ones((4,), np.float32),
            }
            for _ in range(2 * model_axis)
        ]
        eutt = nprng.standard_normal((1, 2, 32, 16), dtype=np.float32)
        eutt[0, :, 8:24, :] = egroups[1]["kwd"][1]  # planted match (row 5)
        eutt_mask = np.ones((1, 2, 32), np.float32)
        evars = emodel.init(
            jax.random.PRNGKey(2), egroups[0]["kwd"], eutt,
            egroups[0]["kwd_mask"], eutt_mask,
        )
        ecat = project_catalog(emodel, evars, egroups, chunk=4)
        casc = make_cascade_score_fn(emodel, chunk=4, shortlist=8)
        want_c = np.asarray(casc(evars, ecat, jnp.asarray(eutt), jnp.asarray(eutt_mask)))
        earrays = {k: v for k, v in ecat.items() if k in ("kwd", "kwd_mask", "mask")}
        ecat_sh = {**ecat, **shard_catalog(earrays, mesh, axis="model")}
        got_c = np.asarray(casc(evars, ecat_sh, jnp.asarray(eutt), jnp.asarray(eutt_mask)))
        assert 5 in np.flatnonzero(got_c), "sharded cascade missed the planted match"
        np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-6)
        print("sharded cascade scoring ok:", int(np.count_nonzero(got_c)), "shortlisted")

        # ---- 3. tensor-parallel Whisper encoder forward
        wcfg = WhisperConfig(
            vocab_size=64, num_mel_bins=8, d_model=32,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_source_positions=16, max_target_positions=16,
        )
        wparams = init_whisper_params(nprng, wcfg)
        specs = whisper_param_sharding(wparams, mesh)
        wparams_tp = device_put_with_specs(wparams, specs)
        mel = nprng.standard_normal(
            (max(2, mesh.shape["data"]), 8, 32)
        ).astype(np.float32)
        enc, _ = jax.jit(lambda p, m: encoder_forward(p, m, wcfg))(wparams_tp, mel)
        np.asarray(enc)  # host fetch = the only reliable completion barrier here
        print("tp encoder ok:", enc.shape)

    # ---- 4. flagship: mesh-parallel batched longform biased decode
    ref, got = flagship_longform_stage(mesh)
    ref_seq = [s.tolist() for s in ref["sequences"]]
    got_seq = [s.tolist() for s in got["sequences"]]
    assert got_seq == ref_seq, (
        f"mesh-parallel longform decode diverged:\nref: {ref_seq}\ngot: {got_seq}"
    )
    print("mesh longform decode ok:",
          [len(s["segments"] if isinstance(s, dict) else s) for s in ref["segments"]])

    # ---- 5. tensor-parallel flagship: the same longform biased decode with
    #         the Whisper params megatron-sharded over `model` end-to-end
    #         (encoder + prefill + beam while_loop; KV caches inherit the
    #         head sharding through GSPMD propagation)
    if mesh.shape.get("model", 1) > 1:
        ref_tp, got_tp = flagship_longform_stage(mesh, tp=True)
        assert [s.tolist() for s in got_tp["sequences"]] == [
            s.tolist() for s in ref_tp["sequences"]
        ], "TP longform decode diverged from the single-device run"
        print("tp longform decode ok")

    # ---- 6. packed (continuous-batching) serving decode on the mesh:
    #         heterogeneous-length corpus streamed through `data`-sharded
    #         slots — every launch has exactly `slots` rows, so the data
    #         axis always divides (no replicated straggler buckets)
    ref_pk, got_pk = flagship_longform_stage(mesh, packed=True)
    assert [s.tolist() for s in got_pk["sequences"]] == [
        s.tolist() for s in ref_pk["sequences"]
    ], "packed mesh serving decode diverged from the single-device run"
    print("packed mesh serving decode ok:",
          [len(s) for s in ref_pk["segments"]])

    # ---- 7. round-4 serving levers on the mesh: int8 self-attention KV
    #         cache (per-token scales riding the sharded cache pytree) +
    #         int8 cross-attention K/V (rank-3 scale leaves sharded over
    #         data alongside the rank-5 slabs) +
    #         per-row language auto-detection (each slot detects on its
    #         OWN first window), through the packed scheduler — still
    #         schedule/sharding-independent
    # + staged cache writes (rank-5 window buffers riding the sharded
    #   cache pytree; flush DUS under GSPMD) — PERF.md round-5 lever
    ref_q, got_q = flagship_longform_stage(
        mesh, packed=True, kv_int8=True, xkv_int8=True, lang_detect=True,
        num_beams=1, kv_staging=4
    )
    assert [s.tolist() for s in got_q["sequences"]] == [
        s.tolist() for s in ref_q["sequences"]
    ], "int8-KV + language-detect packed decode diverged across the mesh"
    print("packed int8-kv + language-detect mesh decode ok")

    print(f"dryrun_multichip({n_devices}) passed")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
