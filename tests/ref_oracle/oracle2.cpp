/* ctypes exporters over GENUINE reference sources, wave 3:
 * ADSREnvelope, Trigger, MeterGraph/ScaledMeterGraph, DynamicDelay,
 * Depopper, ShiftBuffer (see __init__.py _REF_SOURCES).  Same pattern
 * as oracle.cpp: construct the real unit, configure, stream, return
 * raw outputs for the Python tests to compare against the TPU
 * framework's units.
 */

#include <lsp-plug.in/dsp/dsp.h>
#include <lsp-plug.in/dsp-units/filters/DynamicFilters.h>
#include <lsp-plug.in/dsp-units/util/ADSREnvelope.h>
#include <lsp-plug.in/dsp-units/util/Trigger.h>
#include <lsp-plug.in/dsp-units/util/MeterGraph.h>
#include <lsp-plug.in/dsp-units/util/ScaledMeterGraph.h>
#include <lsp-plug.in/dsp-units/util/DynamicDelay.h>
#include <lsp-plug.in/dsp-units/util/Depopper.h>
#include <lsp-plug.in/dsp-units/util/ShiftBuffer.h>

#include <math.h>
#include <string.h>

namespace dspu = lsp::dspu;

extern "C"
{
    /* Genuine DynamicFilters (DynamicFilters.cpp:204-314): one filter,
     * per-sample gain signal, streamed in `block` chunks.  The filter
     * params mirror ref_filter_process (oracle.cpp). */
    int ref_dynamic_filters(uint32_t type, uint32_t slope, float freq,
                            float freq2, float quality, uint32_t sr,
                            const float *gain, const float *x, float *y,
                            int n, int block)
    {
        dspu::DynamicFilters df;
        if (df.init(1) != lsp::STATUS_OK)
            return -1;
        df.set_sample_rate(sr);
        dspu::filter_params_t fp;
        fp.nType = type;
        fp.nSlope = slope;
        fp.fFreq = freq;
        fp.fFreq2 = freq2;
        fp.fGain = 1.0f;
        fp.fQuality = quality;
        if (!df.set_params(0, &fp))
            return -2;
        df.set_filter_active(0, true);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            df.process(0, y + off, x + off, gain + off, todo);
        }
        df.destroy();
        return 0;
    }

    /* Genuine ADSREnvelope (ADSREnvelope.cpp:124-330).  Curve rows:
     * [time, curve, function] for attack/decay/slope/release;
     * hold_time/break_level apply when use_hold/use_break set. */
    int ref_adsr(const float *curves /* 4 x [time, curve, func] */,
                 float hold_time, int use_hold,
                 float break_level, int use_break,
                 float sustain_level,
                 const float *t, float *out, int n)
    {
        dspu::ADSREnvelope env;
        env.set_attack(curves[0], curves[1],
                       (dspu::ADSREnvelope::function_t) (int) curves[2]);
        env.set_decay(curves[3], curves[4],
                      (dspu::ADSREnvelope::function_t) (int) curves[5]);
        env.set_slope(curves[6], curves[7],
                      (dspu::ADSREnvelope::function_t) (int) curves[8]);
        env.set_release(curves[9], curves[10],
                        (dspu::ADSREnvelope::function_t) (int) curves[11]);
        env.set_hold(hold_time, use_hold != 0);
        env.set_break(break_level, use_break != 0);
        env.set_sustain_level(sustain_level);
        env.process(out, t, n);
        return 0;
    }

    /* Genuine Trigger (Trigger.cpp): stream x one sample at a time,
     * record the post-sample state (0 waiting / 1 armed / 2 fired). */
    int ref_trigger(uint32_t mode, uint32_t type, float threshold,
                    float hysteresis, uint32_t hold_samples,
                    const float *x, int32_t *state_out, int n)
    {
        dspu::Trigger trg;
        trg.set_trigger_mode((dspu::trg_mode_t) mode);
        trg.set_trigger_type((dspu::trg_type_t) type);
        trg.set_trigger_threshold(threshold);
        trg.set_trigger_hysteresis(hysteresis);
        trg.set_trigger_hold_samples(hold_samples);
        trg.update_settings();
        for (int i = 0; i < n; ++i)
        {
            trg.single_sample_processor(x[i]);
            state_out[i] = (int32_t) trg.get_trigger_state();
        }
        return 0;
    }

    /* Genuine MeterGraph (MeterGraph.cpp): stream x (in `block` chunks
     * through the vector path), then read the frame history. */
    int ref_meter_graph(uint32_t method, uint32_t period, uint32_t frames,
                        const float *x, float gain, int use_gain, int n,
                        int block, float *frames_out, int n_frames)
    {
        dspu::MeterGraph mg;
        if (!mg.init(frames, period))
            return -1;
        mg.set_method((dspu::meter_method_t) method);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            if (use_gain)
                mg.process(x + off, gain, todo);
            else
                mg.process(x + off, todo);
        }
        mg.read(frames_out, n_frames);
        return 0;
    }

    /* Genuine ScaledMeterGraph (ScaledMeterGraph.cpp): subsampling
     * cascade version. */
    int ref_scaled_meter_graph(uint32_t method, uint32_t subsampling,
                               uint32_t period, uint32_t frames,
                               const float *x, float gain, int n,
                               int block, float *frames_out, int n_frames)
    {
        dspu::ScaledMeterGraph mg;
        if (!mg.init(frames, subsampling, period))
            return -1;
        mg.set_method((dspu::meter_method_t) method);
        mg.set_period(period);
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            mg.process(x + off, gain, todo);
        }
        mg.read(frames_out, n_frames);
        return 0;
    }

    /* Genuine DynamicDelay (DynamicDelay.cpp): per-sample delay,
     * gain and feedback arrays. */
    int ref_dynamic_delay(uint32_t max_delay, const float *x,
                          const float *delay, const float *fgain,
                          const float *fdelay, float *out, int n,
                          int block)
    {
        dspu::DynamicDelay d;
        if (d.init(max_delay) != lsp::STATUS_OK)
            return -1;
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            d.process(out + off, x + off, delay + off, fgain + off,
                      fdelay + off, todo);
        }
        d.destroy();
        return 0;
    }

    /* Genuine Depopper (Depopper.cpp): fade state machine; returns the
     * envelope and gain tracks. */
    int ref_depopper(uint32_t srate,
                     uint32_t fade_in_mode, float fade_in_thresh,
                     float fade_in_time, float fade_in_delay,
                     uint32_t fade_out_mode, float fade_out_thresh,
                     float fade_out_time, float fade_out_delay,
                     float rms_ms,
                     const float *x, float *env, float *gain,
                     int n, int block)
    {
        dspu::Depopper dp;
        if (!dp.init(srate, lsp_max(fade_in_time, fade_out_time)
                     + fade_in_delay + fade_out_delay + 50.0f,
                     rms_ms + 10.0f))
            return -1;
        dp.set_fade_in_mode((dspu::depopper_mode_t) fade_in_mode);
        dp.set_fade_in_threshold(fade_in_thresh);
        dp.set_fade_in_time(fade_in_time);
        dp.set_fade_in_delay(fade_in_delay);
        dp.set_fade_out_mode((dspu::depopper_mode_t) fade_out_mode);
        dp.set_fade_out_threshold(fade_out_thresh);
        dp.set_fade_out_time(fade_out_time);
        dp.set_fade_out_delay(fade_out_delay);
        dp.set_rms_length(rms_ms);
        dp.reconfigure();
        if (block <= 0)
            block = n;
        for (int off = 0; off < n; off += block)
        {
            int todo = (n - off) < block ? (n - off) : block;
            dp.process(env + off, gain + off, x + off, todo);
        }
        return 0;
    }

    /* Genuine ShiftBuffer scripted ops: op 0 = append k samples from
     * feed, op 1 = shift k samples into sink, op 2 = single-sample
     * process(feed[0]) -> sink.  Returns final size. */
    int ref_shift_buffer(uint32_t capacity, uint32_t gap,
                         const int32_t *ops, const int32_t *counts,
                         int n_ops, const float *feed, float *sink,
                         int *out_size)
    {
        dspu::ShiftBuffer sb;
        if (!sb.init(capacity, gap))
            return -1;
        const float *fp = feed;
        float *sp = sink;
        for (int i = 0; i < n_ops; ++i)
        {
            int k = counts[i];
            switch (ops[i])
            {
                case 0: fp += sb.append(fp, k); break;
                case 1: sp += sb.shift(sp, k); break;
                default: *sp++ = sb.process(*fp++); break;
            }
        }
        *out_size = (int) sb.size();
        sb.destroy();
        return 0;
    }
}
