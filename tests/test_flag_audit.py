"""Flag-surface audit: every flag the reference defines is either registered
here under the same name or explicitly accounted for in docs/MIGRATION.md.

The reference's recipe surface is its `tf.app.flags.DEFINE_*` calls (SURVEY
section 6; e.g. /root/reference/learners/abstract_learner.py,
nets/*_run.py, tools/conversion/*.py).  Recipe portability is the rebuild's
core contract -- this test makes it machine-checked instead of
hand-maintained: a reference flag that is neither in the FlagRegistry nor
mentioned in MIGRATION.md (rename/retire tables) fails the audit.

The flag list below is frozen from a grep of the reference tree (excluding
the vendored third-party code under utils/external/, which is not user
recipe surface).  When /root/reference is present, the list itself is also
re-derived and cross-checked so it cannot silently go stale.
"""

import os
import re

import pytest

from pocketflow_tpu.config import FLAGS

MIGRATION = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'MIGRATION.md')
REFERENCE_ROOT = '/root/reference'

REFERENCE_FLAGS = [
    'backbone_ckpt_dir',
    'backbone_model_scope',
    'batch_size',
    'batch_size_eval',
    'batch_size_norm',
    'buffer_size',
    'coll_names',
    'cp_best_path',
    'cp_channel_pruned_path',
    'cp_finetune',
    'cp_lasso',
    'cp_list_group',
    'cp_lrn_rate_ft',
    'cp_nb_batches',
    'cp_nb_iters_ft_ratio',
    'cp_nb_points_per_layer',
    'cp_nb_rlouts',
    'cp_nb_rlouts_min',
    'cp_noise_tolerance',
    'cp_original_path',
    'cp_preserve_ratio',
    'cp_prune_list_file',
    'cp_prune_option',
    'cp_quadruple',
    'cp_retrain',
    'cp_reward_policy',
    'cp_uniform_preserve_ratio',
    'cpg_lrn_rate_adam',
    'cpg_lrn_rate_pgd_decr',
    'cpg_lrn_rate_pgd_incr',
    'cpg_lrn_rate_pgd_init',
    'cpg_nb_iters_layer',
    'cpg_prune_ratio',
    'cpg_prune_ratio_file',
    'cpg_prune_ratio_type',
    'cpg_save_path',
    'cpg_save_path_eval',
    'cpg_skip_ht_layers',
    'cpr_ista_lrn_rate',
    'cpr_ista_nb_iters',
    'cpr_lstsq_lrn_rate',
    'cpr_lstsq_nb_iters',
    'cpr_nb_crops_per_smpl',
    'cpr_nb_smpls',
    'cpr_prune_ratio',
    'cpr_save_path',
    'cpr_save_path_eval',
    'cpr_save_path_ws',
    'cpr_skip_frst_layer',
    'cpr_skip_last_layer',
    'cpr_skip_op_names',
    'cpr_warm_start',
    'cycle_length',
    'data_dir_hdfs',
    'data_dir_local',
    'data_disk',
    'data_format',
    'data_hdfs_host',
    'dcp_lrn_rate_adam',
    'dcp_nb_iters_block',
    'dcp_nb_iters_layer',
    'dcp_nb_stages',
    'dcp_prune_ratio',
    'dcp_save_path',
    'dcp_save_path_eval',
    'ddpg_actor_depth',
    'ddpg_actor_width',
    'ddpg_batch_size',
    'ddpg_bsln_decy_rate',
    'ddpg_critic_depth',
    'ddpg_critic_width',
    'ddpg_enbl_bsln_func',
    'ddpg_gamma',
    'ddpg_loss_w_dcy',
    'ddpg_lrn_rate',
    'ddpg_noise_adpt_rat',
    'ddpg_noise_dst_finl',
    'ddpg_noise_prtl',
    'ddpg_noise_std_finl',
    'ddpg_noise_std_init',
    'ddpg_noise_type',
    'ddpg_record_step',
    'ddpg_rms_eps',
    'ddpg_tau',
    'debug',
    'default_ranges_max',
    'default_ranges_min',
    'enbl_chn_prune',
    'enbl_dst',
    'enbl_fake_prune',
    'enbl_fake_quant',
    'enbl_multi_gpu',
    'enbl_post_quant',
    'enbl_uni_quant',
    'enbl_warm_start',
    'exec_mode',
    'fake_prune_ratio',
    'ignore_missing_vars',
    'image_size',
    'image_size_eval',
    'input_coll',
    'input_dtype',
    'input_name',
    'keep_topk',
    'learner',
    'log_dir',
    'loss_w_dcy',
    'loss_w_dst',
    'lrn_rate_dcy_bnds',
    'lrn_rate_dcy_rates',
    'lrn_rate_init',
    'lrn_rate_min',
    'match_threshold',
    'mean_values',
    'min_size',
    'mobilenet_depth_mult',
    'mobilenet_version',
    'model_dir',
    'model_dir_in',
    'model_dir_out',
    'model_file',
    'model_http_url',
    'model_scope',
    'momentum',
    'nb_bboxs_max',
    'nb_classes',
    'nb_dims',
    'nb_epochs_rat',
    'nb_iters_cls_wmup',
    'nb_iters_train',
    'nb_repts',
    'nb_repts_warmup',
    'nb_rlouts',
    'nb_rlouts_eval',
    'nb_smpls_eval',
    'nb_smpls_train',
    'nb_smpls_val',
    'nb_threads',
    'neg_threshold',
    'negative_ratio',
    'nms_threshold',
    'nms_topk',
    'nuql_activation_bits',
    'nuql_bucket_size',
    'nuql_bucket_type',
    'nuql_enbl_random_layers',
    'nuql_enbl_rl_agent',
    'nuql_enbl_rl_global_tune',
    'nuql_enbl_rl_layerwise_tune',
    'nuql_equivalent_bits',
    'nuql_init_style',
    'nuql_nb_rlouts',
    'nuql_opt_mode',
    'nuql_quant_epochs',
    'nuql_quantize_all_layers',
    'nuql_save_quant_model_path',
    'nuql_tune_disp_steps',
    'nuql_tune_global_steps',
    'nuql_tune_layerwise_steps',
    'nuql_tune_save_path',
    'nuql_use_buckets',
    'nuql_w_bit_max',
    'nuql_w_bit_min',
    'nuql_weight_bits',
    'output_coll',
    'output_name',
    'outputs_dump_dir',
    'prefetch_size',
    'resnet_size',
    'rlout_len',
    'save_path',
    'save_path_dst',
    'save_path_eval',
    'save_step',
    'select_threshold',
    'std_dev_values',
    'summ_step',
    'tempr_dst',
    'tensor_names',
    'uql_activation_bits',
    'uql_bucket_size',
    'uql_bucket_type',
    'uql_enbl_random_layers',
    'uql_enbl_rl_agent',
    'uql_enbl_rl_global_tune',
    'uql_enbl_rl_layerwise_tune',
    'uql_equivalent_bits',
    'uql_nb_rlouts',
    'uql_quant_epochs',
    'uql_quantize_all_layers',
    'uql_save_quant_model_path',
    'uql_tune_disp_steps',
    'uql_tune_global_steps',
    'uql_tune_layerwise_steps',
    'uql_tune_save_path',
    'uql_use_buckets',
    'uql_w_bit_max',
    'uql_w_bit_min',
    'uql_weight_bits',
    'uqtf_activation_bits',
    'uqtf_enbl_manual_quant',
    'uqtf_freeze_bn_delay',
    'uqtf_lrn_rate_dcy',
    'uqtf_quant_delay',
    'uqtf_save_path',
    'uqtf_save_path_eval',
    'uqtf_save_path_probe',
    'uqtf_save_path_probe_eval',
    'uqtf_weight_bits',
    'warm_start_excl_scopes',
    'ws_iter_ratio_beg',
    'ws_iter_ratio_end',
    'ws_lrn_rate_ft',
    'ws_lrn_rate_rg',
    'ws_mask_update_step',
    'ws_nb_iters_feval',
    'ws_nb_iters_ft',
    'ws_nb_iters_rg',
    'ws_nb_rlouts',
    'ws_nb_rlouts_min',
    'ws_prune_ratio',
    'ws_prune_ratio_exp',
    'ws_prune_ratio_prtl',
    'ws_reward_type',
    'ws_save_path',
]


def _covered_by_migration(flag, migration_text):
    # a flag counts as documented if it appears verbatim in MIGRATION.md
    # (rename tables use backticks, but prose mentions count too)
    return flag in migration_text


def test_every_reference_flag_is_registered_or_documented():
    migration_text = open(MIGRATION).read()
    uncovered = [f for f in REFERENCE_FLAGS
                 if f not in FLAGS
                 and not _covered_by_migration(f, migration_text)]
    assert uncovered == [], (
        'reference flags neither registered nor documented in '
        'docs/MIGRATION.md: %s' % uncovered)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason='reference tree not mounted')
def test_frozen_flag_list_matches_reference_tree():
    pat = re.compile(r"""DEFINE_(?:string|integer|float|boolean|bool)\(\s*['\"]([a-z_0-9]+)['\"]""")
    found = set()
    for root, dirs, files in os.walk(REFERENCE_ROOT):
        dirs[:] = [d for d in dirs if d != 'external']
        for name in files:
            if not name.endswith('.py'):
                continue
            with open(os.path.join(root, name), errors='replace') as fin:
                found.update(pat.findall(fin.read()))
    assert found == set(REFERENCE_FLAGS), (
        'frozen list is stale: missing=%s extra=%s'
        % (sorted(found - set(REFERENCE_FLAGS)),
           sorted(set(REFERENCE_FLAGS) - found)))
