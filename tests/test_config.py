import pathlib

from oadp_tpu.utils import Config, parse_override


def _write(tmp_path: pathlib.Path, name: str, text: str) -> pathlib.Path:
    path = tmp_path / name
    path.write_text(text)
    return path


def test_base_inheritance(tmp_path):
    _write(tmp_path, 'base.py', "a = dict(x=1, y=2)\nb = 3\n")
    child = _write(
        tmp_path, 'child.py', "_base_ = ['base.py']\na = dict(y=5, z=6)\n"
    )
    config = Config.load(child)
    assert config.a == dict(x=1, y=5, z=6)
    assert config.b == 3


def test_delete_semantics(tmp_path):
    _write(tmp_path, 'base.py', "d = dict(keep=1, drop=2)\n")
    child = _write(
        tmp_path, 'child.py',
        "_base_ = ['base.py']\nd = dict(_delete_=True, fresh=7)\n"
    )
    config = Config.load(child)
    assert config.d == dict(fresh=7)


def test_chained_bases(tmp_path):
    _write(tmp_path, 'a.py', "v = dict(p=1)\n")
    _write(tmp_path, 'b.py', "_base_ = ['a.py']\nv = dict(q=2)\n")
    child = _write(tmp_path, 'c.py', "_base_ = ['b.py']\nv = dict(r=3)\n")
    assert Config.load(child).v == dict(p=1, q=2, r=3)


def test_dotted_override():
    config = Config._wrap(Config({'trainer': {'optimizer': {'lr': 0.02}}}))
    config.override(parse_override(['.trainer.optimizer.lr:0.01']))
    assert config.trainer.optimizer.lr == 0.01
    config.override(parse_override(['.new.path:"hello"']))
    assert config.new.path == 'hello'


def test_attribute_access_and_dump(tmp_path):
    config = Config._wrap({'m': {'n': [1, 2, {'o': 3}]}})
    assert config.m.n[2].o == 3
    out = tmp_path / 'dump.py'
    config.dump(out)
    assert Config.load(out) == config


def test_categories():
    from oadp_tpu.base import coco, lvis
    assert coco.num_bases == 48
    assert coco.num_novels == 17
    assert coco.num_all == 65
    assert lvis.num_bases == 866
    assert lvis.num_novels == 337
    assert coco.all_ == coco.bases + coco.novels
    assert 'person' in coco.bases


def test_pth_roundtrip(tmp_path):
    import numpy as np

    from oadp_tpu.utils import PthAccessLayer, load_pth, save_pth

    obj = {
        'embeddings': np.random.rand(4, 8).astype(np.float16),
        'bboxes': np.zeros((4, 4), np.float16),
    }
    save_pth(obj, tmp_path / 'x.pth')
    back = load_pth(tmp_path / 'x.pth')
    np.testing.assert_array_equal(back['embeddings'], obj['embeddings'])

    layer = PthAccessLayer(str(tmp_path), 'task', readonly=False)
    layer['000000000001'] = obj
    assert '000000000001' in layer
    assert list(layer) == ['000000000001']
    np.testing.assert_array_equal(
        layer['000000000001']['bboxes'], obj['bboxes']
    )


def test_store_flags(monkeypatch):
    from oadp_tpu.utils import Store
    monkeypatch.setenv('DRY_RUN', '1')
    assert Store.DRY_RUN
    monkeypatch.setenv('DRY_RUN', '0')
    assert not Store.DRY_RUN
    monkeypatch.setenv('DUMP', '/tmp/x')
    assert Store.DUMP == '/tmp/x'


def test_coco_image_set_lvis_paths(tmp_path):
    """LVIS images resolve through coco_url into the COCO tree
    (reference oadp/oake/objects.py:192-195)."""
    import json
    from oadp_tpu.oake.base import CocoImageSet

    ann = tmp_path / 'ann.json'
    ann.write_text(json.dumps(dict(images=[
        dict(id=7, coco_url='http://images.cocodataset.org/train2017/000000000007.jpg'),
        dict(id=3, coco_url='http://images.cocodataset.org/val2017/000000000003.jpg'),
    ])))
    ds = CocoImageSet('data/coco', str(ann), lvis=True)
    assert ds.ids == [3, 7]  # sorted (torchvision CocoDetection)
    assert ds.unsorted_ids == [7, 3]
    assert str(ds.path(7)).endswith('data/coco/train2017/000000000007.jpg')
    assert str(ds.path(3)).endswith('data/coco/val2017/000000000003.jpg')


def test_bucket():
    from oadp_tpu.oake.base import bucket
    assert bucket(1) == 8
    assert bucket(8) == 8
    assert bucket(9) == 16
    assert bucket(1025) == 2048  # beyond largest: rounded up in units
    assert bucket(7, (4, 16)) == 16
