"""Data-pipeline tests: tokenizer, annotations, maps, batch assembly."""

import json
import os

import numpy as np
import pytest

from avdn_tpu.data.tokenizer import WordPieceTokenizer, basic_tokenize
from avdn_tpu.data.annotations import load_annotations, ANDHDataset
from avdn_tpu.data.maps import load_map_image, attention_circles, DeviceMapBank
from avdn_tpu.data.batcher import BatcherConfig, make_train_batch
from fixtures import write_fixture_dataset


class TestTokenizer:
    def test_basic_tokenize(self):
        assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
        assert basic_tokenize("don't stop") == ["don", "'", "t", "stop"]

    def test_vocab_file_wordpiece(self, tmp_path):
        vocab = ["[PAD]"] * 100 + ["[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "fly", "north", "##ward", "over", "the", "build", "##ing"]
        # make unique pads
        vocab = [f"[unused{i}]" if 0 < i < 100 else v
                 for i, v in enumerate(vocab)]
        vocab[0] = "[PAD]"
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(vocab) + "\n")
        tok = WordPieceTokenizer.from_vocab_file(str(p))
        assert tok.tokenize("fly northward over the building") == [
            "fly", "north", "##ward", "over", "the", "build", "##ing"
        ]
        ids, mask = tok(["fly north", "over"])
        assert ids.shape == mask.shape
        assert ids[0, 0] == tok.cls_id
        assert mask[1].sum() == 3  # CLS over SEP

    def test_fallback_deterministic(self):
        tok = WordPieceTokenizer.load(None)
        a1, _ = tok(["fly over the building"])
        a2, _ = tok(["fly over the building"])
        np.testing.assert_array_equal(a1, a2)

    def test_pad_to(self):
        tok = WordPieceTokenizer.load(None)
        ids, mask = tok(["short text"], pad_to=32)
        assert ids.shape == (1, 32)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return write_fixture_dataset(str(tmp_path_factory.mktemp("andh")))


class TestAnnotations:
    def test_load_and_normalise(self, fixture_root):
        data = load_annotations(os.path.join(fixture_root, "AVDN", "annotations"),
                                ["train"])
        assert len(data) == 8
        item = data[0]
        assert isinstance(item["angle"], int) and 0 <= item["angle"] < 360
        assert item["instructions"] == item["instructions"].lower()
        assert isinstance(item["pre_dialogs"], str)
        assert all(isinstance(c, np.ndarray) for c in item["gt_path_corners"])

    def test_batches_wrap_around(self, fixture_root):
        ds = ANDHDataset(os.path.join(fixture_root, "AVDN", "annotations"),
                         ["train"], batch_size=3, seed=0)
        batches = list(ds)
        assert all(len(b) == 3 for b in batches)
        assert len(batches) == 3  # 8 items → 3 batches of 3 (with refill)

    def test_shard_ownership_disjoint_and_complete(self, fixture_root):
        """Every instr_id is OWNED by exactly one process shard; wrap-around
        pad items are excluded from owned_instr_ids (multi-process debug
        writers key file ownership off this — loop._write_debug_images)."""
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        count = 3
        shards = [ANDHDataset(anno, ["train"], 1, seed=0, shard=(i, count))
                  for i in range(count)]
        full = ANDHDataset(anno, ["train"], 1, seed=0)
        assert full.owned_instr_ids is None  # unsharded: owns everything
        all_ids = {it["map_name"] + "__" + str(it["route_index"])
                   for it in full.data}
        owned = [s.owned_instr_ids for s in shards]
        assert set().union(*owned) == all_ids
        for i in range(count):
            for j in range(i + 1, count):
                assert not owned[i] & owned[j]
        # shards still yield equal-length data (pad kept for batch parity)
        assert len({len(s.data) for s in shards}) == 1

    def test_shuffle_seeded(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        a = ANDHDataset(anno, ["train"], 2, seed=5)
        b = ANDHDataset(anno, ["train"], 2, seed=5)
        assert [x["route_index"] for x in a.data] == [
            x["route_index"] for x in b.data
        ]


class TestMaps:
    def test_load_resize(self, fixture_root):
        img_dir = os.path.join(fixture_root, "AVDN", "train_images")
        img = load_map_image(os.path.join(img_dir, "fixmapA.tif"),
                             lng_ratio=2.4e-5, lat_ratio=2e-5)
        assert img.shape[0] == 256
        assert abs(img.shape[1] - 256) <= 1  # width rescaled to square pixels

    def test_device_bank_slots(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        bank = DeviceMapBank(os.path.join(fixture_root, "AVDN", "train_images"),
                             (256, 256), n_slots=3)
        items = next(iter(ds))
        arr, slot_of = bank.prepare(items)
        assert arr.shape == (3, 256, 256, 3)
        assert set(slot_of) == {it["map_name"] for it in items}
        # second prepare reuses slots
        _, slot_of2 = bank.prepare(items)
        assert slot_of == slot_of2

    def test_oversized_tile_grows_bank(self, fixture_root):
        """Tiles larger than the slot shape must auto-grow the bank, never
        silently crop (real xView tiles can exceed any fixed default after
        the square-pixel width rescale, src/env.py:217-221)."""
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        items = next(iter(ds))
        img_dir = os.path.join(fixture_root, "AVDN", "train_images")
        bank = DeviceMapBank(img_dir, (128, 128), n_slots=3, grow_quantum=64)
        arr, slot_of = bank.prepare(items)
        name = items[0]["map_name"]
        full = load_map_image(os.path.join(img_dir, name + ".tif"),
                              items[0]["lng_ratio"], items[0]["lat_ratio"])
        assert arr.shape[1] >= full.shape[0] and arr.shape[2] >= full.shape[1]
        assert arr.shape[1] % 64 == 0 and arr.shape[2] % 64 == 0
        got = np.asarray(arr[slot_of[name]])[: full.shape[0], : full.shape[1]]
        np.testing.assert_array_equal(got, full)

    def test_growth_preserves_resident_slots(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        items = next(iter(ds))
        img_dir = os.path.join(fixture_root, "AVDN", "train_images")
        bank = DeviceMapBank(img_dir, (512, 512), n_slots=4, grow_quantum=128)
        arr, slot_of = bank.prepare(items)
        name = items[0]["map_name"]
        before = np.asarray(arr[slot_of[name]])
        # a synthetic oversized map forces growth while `name` stays resident
        rng = np.random.default_rng(0)
        bank._host_cache["huge"] = rng.integers(
            0, 255, (700, 900, 3), dtype=np.uint8
        )
        big_item = dict(items[0], map_name="huge")
        arr2, slot_of2 = bank.prepare(items + [big_item])
        assert bank.bank_hw == (768, 1024)
        assert slot_of2[name] == slot_of[name]  # slot retained
        after = np.asarray(arr2[slot_of2[name]])[:512, :512]
        np.testing.assert_array_equal(after, before)
        got = np.asarray(arr2[slot_of2["huge"]])[:700, :900]
        np.testing.assert_array_equal(got, bank._host_cache["huge"])

    def test_oversized_tile_raises_when_growth_disabled(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        items = next(iter(ds))
        img_dir = os.path.join(fixture_root, "AVDN", "train_images")
        bank = DeviceMapBank(img_dir, (128, 128), n_slots=3, auto_grow=False)
        with pytest.raises(ValueError, match="exceeds bank slots"):
            bank.prepare(items)


class TestHostCacheLRU:
    """The host decode cache is a bounded LRU (deviation from the
    reference's batch-scoped eviction, src/env.py:234-240 — PARITY.md #9):
    a map alternating between batches must decode exactly once."""

    def test_alternating_batches_decode_once(self, fixture_root, monkeypatch):
        import avdn_tpu.data.maps as maps_mod

        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        img_dir = os.path.join(fixture_root, "AVDN", "train_images")
        bank = DeviceMapBank(img_dir, (256, 256), n_slots=2)

        decodes = []
        orig = maps_mod.load_map_image

        def spy(path, *a, **k):
            decodes.append(os.path.basename(path))
            return orig(path, *a, **k)

        monkeypatch.setattr(maps_mod, "load_map_image", spy)
        items = list(ds)[0]
        batch_a = [it for it in items if it["map_name"] == "fixmapA"][:1]
        batch_b = [it for it in items if it["map_name"] == "fixmapB"][:1]
        assert batch_a and batch_b
        for _ in range(3):  # A, B, A, B, ... — the reference re-decodes each flip
            bank.prepare(batch_a)
            bank.prepare(batch_b)
        assert sorted(decodes) == ["fixmapA.tif", "fixmapB.tif"], decodes

    def test_cache_is_bounded(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        img_dir = os.path.join(fixture_root, "AVDN", "train_images")
        bank = DeviceMapBank(img_dir, (256, 256), n_slots=2,
                             host_cache_maps=1)
        items = list(ds)[0]
        rng = np.random.default_rng(0)
        # feed 5 synthetic single-map batches; the LRU must stay at bound
        for i in range(5):
            nm = f"synth{i}"
            bank._host_cache[nm] = rng.integers(0, 255, (64, 64, 3),
                                                dtype=np.uint8)
            bank.prepare([dict(items[0], map_name=nm)])
            assert len(bank._host_cache) <= 2  # bound(=1) floored at batch maps


class TestFullTrajectoryMode:
    """--train_val_on_full dataset concatenation (the reference designed it
    but left it commented out, src/env.py:107-168)."""

    def _round(self, traj, k, map_name="m", n_steps=2, last=3, angle=90.0):
        base = 0.001 * k
        path = [
            [[base + 1e-4 * s, base], [base + 1e-4 * s, base + 1e-4],
             [base + 1e-4 * s + 1e-4, base + 1e-4],
             [base + 1e-4 * s + 1e-4, base]]
            for s in range(n_steps)
        ]
        return {
            "map_name": map_name,
            "route_index": f"{traj}_{k}",
            "angle": angle,
            "last_round_idx": last,
            "gt_path_corners": path,
            "instructions": f"Round {k} INSTRUCTION.",
            "pre_dialogs": [f"[QUE] q{k}"],
            "attention_list": [[[0.001 * j, 0.001], 10 + j]
                               for j in range(k)],
            "lat_ratio": 2e-5,
            "lng_ratio": 2e-5,
            "gps_botm_left": [0.0, 0.0],
            "gps_top_right": [0.01, 0.01],
            "destination": path[-1],
        }

    def test_concatenation_semantics(self):
        from avdn_tpu.data.annotations import _concat_full_trajectories

        raw = [
            self._round("7", 1, angle=0.0),
            self._round("7", 2, angle=90.0),
            self._round("7", 3, angle=220.0),
            self._round("8", 1, last=1, angle=45.0),
        ]
        out = _concat_full_trajectories(raw)
        assert len(out) == 2
        full = next(o for o in out if o["route_index"].startswith("7"))
        # rounds joined with [SEP] + compass naming (env.py:147-149)
        assert "round 1 instruction." in full["instructions"]
        assert "[sep] facing east" in full["instructions"]
        assert "[sep] facing southwest" in full["instructions"]
        # corners: 3 rounds x 2 steps + appended goal view (env.py:157-168)
        assert len(full["gt_path_corners"]) == 7
        goal = full["gt_path_corners"][-1]
        # the goal square is built from the BASE round's destination field —
        # in AVDN every round carries the same full-trajectory destination,
        # and the reference reads it off the round-1 item (env.py:157)
        des = np.asarray(raw[0]["destination"])
        np.testing.assert_allclose(goal.mean(axis=0), des.mean(axis=0),
                                   atol=1e-6)
        # goal view edge >= the 40m floor (env.py:161)
        edge = np.linalg.norm(goal[0] - goal[1])
        assert edge >= 40 / 11.13 / 1e4 - 1e-9
        # attention list comes from the LAST round (env.py:150)
        assert len(full["attention_list"]) == 3
        # single-round trajectory passes through with just the goal appended
        single = next(o for o in out if o["route_index"].startswith("8"))
        assert len(single["gt_path_corners"]) == 3

    def test_dataset_full_traj_flag(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 2, seed=0, full_traj=True)
        # fixture items are single-round: one episode per item, each with the
        # goal view appended
        assert ds.size() == 8
        for it in ds.data:
            assert isinstance(it["gt_path_corners"][-1], np.ndarray)


class TestBatcher:
    def test_make_train_batch(self, fixture_root):
        anno = os.path.join(fixture_root, "AVDN", "annotations")
        ds = ANDHDataset(anno, ["train"], 4, seed=0)
        items = next(iter(ds))
        tok = WordPieceTokenizer.load(None)
        cfg = BatcherConfig(instr_pad=48, dialog_pad=96, lang_dim=64)
        batch, meta = make_train_batch(items, tok, None, cfg)
        B = 4
        assert batch.episode.start_corners.shape == (B, 4, 2)
        assert batch.ids_instr.shape == (B, 48)
        assert batch.ids_dialog.shape == (B, 96)
        # offsets are inside the map extent
        sc = np.asarray(batch.episode.start_corners)
        ext = np.asarray(batch.episode.extent)
        assert np.all(sc >= 0) and np.all(sc <= ext[:, None, :])
        assert all(m["num_dia"] >= 1 for m in meta)
        assert all("__" in m["instr_id"] for m in meta)
