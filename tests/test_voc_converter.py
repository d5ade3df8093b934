"""Real-VOC converter (XML+JPEG -> npz shards) + VOC 'difficult' protocol."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _write_fake_voc(root, ids, difficult_ids=()):
    """Create a minimal VOCdevkit/VOC2007-style tree with PIL JPEGs."""
    from PIL import Image
    os.makedirs(os.path.join(root, 'Annotations'), exist_ok=True)
    os.makedirs(os.path.join(root, 'JPEGImages'), exist_ok=True)
    os.makedirs(os.path.join(root, 'ImageSets', 'Main'), exist_ok=True)
    rng = np.random.default_rng(0)
    for image_id in ids:
        w, h = 120, 90
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, 'JPEGImages', image_id + '.jpg'), quality=90)
        ann = ET.Element('annotation')
        size = ET.SubElement(ann, 'size')
        ET.SubElement(size, 'width').text = str(w)
        ET.SubElement(size, 'height').text = str(h)
        ET.SubElement(size, 'depth').text = '3'
        for cls_name, box, diff in [
                ('dog', (11, 10, 61, 50), image_id in difficult_ids),
                ('car', (31, 21, 101, 71), False)]:
            obj = ET.SubElement(ann, 'object')
            ET.SubElement(obj, 'name').text = cls_name
            ET.SubElement(obj, 'difficult').text = '1' if diff else '0'
            bnd = ET.SubElement(obj, 'bndbox')
            ET.SubElement(bnd, 'xmin').text = str(box[0])
            ET.SubElement(bnd, 'ymin').text = str(box[1])
            ET.SubElement(bnd, 'xmax').text = str(box[2])
            ET.SubElement(bnd, 'ymax').text = str(box[3])
        ET.ElementTree(ann).write(
            os.path.join(root, 'Annotations', image_id + '.xml'))
    with open(os.path.join(root, 'ImageSets', 'Main', 'trainval.txt'), 'w') as f:
        f.write('\n'.join(ids) + '\n')


def test_convert_pascalvoc_roundtrip(tmp_path):
    from pocketflow_tpu.tools import convert_pascalvoc as cv
    from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset, VOC_CLASSES
    voc = str(tmp_path / 'VOC2007')
    out = str(tmp_path / 'npz')
    ids = ['000001', '000002', '000003']
    _write_fake_voc(voc, ids, difficult_ids={'000002'})
    nb = cv.convert(voc, 'trainval', 'train', out, image_size=96, shard_size=2)
    assert nb == 3
    shards = sorted(os.listdir(out))
    assert shards == ['train_0000.npz', 'train_0001.npz']

    with FLAGS.scope(data_dir_local=out, synthetic_data=False,
                     voc_image_size=96, batch_size=2, nb_smpls_train=3):
        ds = PascalVocDataset(is_train=True)
        images, labels = ds._load_arrays()
    assert images.shape == (3, 96, 96, 3) and images.dtype == np.uint8
    assert labels.shape[0] == 3 and labels.shape[2] == 6
    dog, car = VOC_CLASSES.index('dog') + 1, VOC_CLASSES.index('car') + 1
    # image 0: both boxes valid, classes + normalized coords round-trip
    assert labels[0, 0, 0] == dog and labels[0, 1, 0] == car
    # dog bndbox xmin=11 ymin=10 xmax=61 ymax=50 (1-based) in a 120x90 image
    np.testing.assert_allclose(labels[0, 0, 1:5],
                               [9 / 90, 10 / 120, 49 / 90, 60 / 120],
                               atol=1e-6)
    assert labels[0, 0, 5] == 1.0 and labels[0, 1, 5] == 1.0
    # image 1: the dog is 'difficult' -> validity -1 (ignored by protocol)
    assert labels[1, 0, 5] == -1.0 and labels[1, 1, 5] == 1.0


def test_voc_eval_ignores_difficult():
    """A detection matching ONLY a difficult gt is neither tp nor fp."""
    from pocketflow_tpu.nets.detection import voc_eval
    gt = np.zeros((1, 2, 6), np.float32)[0]
    gt[0] = [1, 0.1, 0.1, 0.5, 0.5, -1.0]   # difficult
    gt[1] = [1, 0.6, 0.6, 0.9, 0.9, 1.0]    # normal
    dets_hit_difficult = [{'class': 1, 'score': 0.95,
                           'box': [0.1, 0.1, 0.5, 0.5]},
                          {'class': 1, 'score': 0.9,
                           'box': [0.6, 0.6, 0.9, 0.9]}]
    res = voc_eval.evaluate_detections([dets_hit_difficult], [gt], nb_classes=2)
    assert res['mAP'] == pytest.approx(1.0)  # difficult match didn't hurt
    # same detections but difficult box now counts as padding-excluded gt
    gt_fp = gt.copy()
    gt_fp[0, 5] = 0.0  # padding: detection on it becomes a false positive
    res2 = voc_eval.evaluate_detections([dets_hit_difficult], [gt_fp],
                                        nb_classes=2)
    assert res2['mAP'] < 1.0
