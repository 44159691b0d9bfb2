"""TPU-native hot ops: STFT frontend, fused recurrent cells, sampling."""
