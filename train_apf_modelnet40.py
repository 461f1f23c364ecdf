"""APF on ModelNet40 — the BASELINE.md north-star config
(1024-pt clouds, 40 classes, frozen ViT-B + adapters).

The reference has no ModelNet40 loader; this entry mirrors ``train_apf.py``
with the benchmark dataset (``modelnet40_ply_hdf5_2048`` layout under
``root_dir``).
"""

from pointvit_tpu.train import APFTrainer

model_config = {
    'num_classes': 40,
    'in_channels': 4,
    'vit_name': 'vit_base_patch16_224',
    'pretrained': True,
    'embedding_dim': 768,
    'npoint': 196,
    'nsample': 32,
    'dropout_rate': 0.1,
    'dropout_path_rate': 0.1,
}

dataset_config = {
    'dataset': 'modelnet40',
    # REPLACE WITH CUSTOM DATASET PATH (modelnet40_ply_hdf5_2048 directory)
    'root_dir': '.data/modelnet40_ply_hdf5_2048',
    'train_num_points': 1024,
    'test_num_points': 1024,
    'normalize': True,
    'use_custom_augmentation': True,
    'augmentation_probability': 0.5,
    'use_height': True,
}

train_config = {
    'batch_size': 32,
    'save_interval': 100,
    'epochs': 100,
    'label_smoothing': 0.3,
    'learning_rate': 5e-4,
    'weight_decay': 5e-2,
    'warmup_epochs': 10,
    'warmup_lr_init': 1e-3,
}

if __name__ == "__main__":
    trainer = APFTrainer(
        model_config=model_config,
        dataset_config=dataset_config,
        train_config=train_config,
        device='tpu',
        output_dir='./output/apf_modelnet40',
    )
    trainer.train()
