from svision_tpu.models.alexnet import AlexNet, init_params, forward, NUM_CLASSES
