import random

from theora_tpu.bitio import BitReader, BitWriter


def test_roundtrip_random():
    rng = random.Random(1234)
    fields = []
    bw = BitWriter()
    for _ in range(2000):
        nbits = rng.randint(1, 32)
        val = rng.getrandbits(nbits)
        fields.append((val, nbits))
        bw.write(val, nbits)
    data = bw.bytes()
    br = BitReader(data)
    for val, nbits in fields:
        assert br.read(nbits) == val
    assert not br.eof


def test_read_past_eof_returns_zeros():
    br = BitReader(b"\xff")
    assert br.read(8) == 0xFF
    assert br.bytes_left() == 0
    assert br.read(8) == 0
    assert br.eof
    assert br.bytes_left() == -1


def test_read1_and_partial_byte():
    bw = BitWriter()
    bw.write(0b101, 3)
    data = bw.bytes()
    assert data == b"\xa0"
    br = BitReader(data)
    assert br.read1() == 1
    assert br.read1() == 0
    assert br.read1() == 1
