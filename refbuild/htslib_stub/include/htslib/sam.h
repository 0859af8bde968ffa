/* Minimal htslib stand-in: the exact text-SAM subset the reference FEM
 * binary uses (see /root/reference/src/output_queue.c:17-19,83,114 and
 * /root/reference/src/align.c:546-632). The real htslib submodule is not
 * vendored in this environment (/root/reference/extern/htslib is empty),
 * so this header + sam_stub.c let /root/reference/src compile unmodified
 * for differential testing. Only `sam_open_format(path, "w", NULL)` (text
 * SAM, no BGZF) is supported; rendering matches htslib's sam_format1 for
 * every field FEM sets.
 */
#ifndef HTSLIB_STUB_SAM_H
#define HTSLIB_STUB_SAM_H

#include <inttypes.h> /* real htslib sam.h exposes PRIu64 etc. transitively */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
/* Real htslib sam.h pulls in htslib/kstring.h; the reference's align.c
 * uses ks_str/ks_len/kstring_t through that path. The vendored klib
 * kstring.h (same API) is on the include path (-I <ref>/src). */
#include "kstring.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t hts_pos_t;

typedef struct samFile_stub {
    FILE *fp;
} samFile;
typedef samFile htsFile;

/* Fields FEM touches directly: n_targets, target_len, target_name,
 * l_text, text, sdict, hrecs, ref_count (output_queue.c:95-113). */
typedef struct sam_hdr_t {
    int32_t n_targets;
    int32_t ignore_sam_err;
    size_t l_text;
    uint32_t *target_len;
    char **target_name;
    char *text;
    void *sdict;
    void *hrecs;
    uint32_t ref_count;
} sam_hdr_t;
typedef sam_hdr_t bam_hdr_t;

typedef struct bam1_core_t {
    hts_pos_t pos;
    int32_t tid;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_extranul;
    uint16_t flag;
    uint16_t l_qname;
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    hts_pos_t mpos;
    hts_pos_t isize;
} bam1_core_t;

typedef struct bam1_t {
    bam1_core_t core;
    uint64_t id;
    uint8_t *data;
    int l_data;
    uint32_t m_data;
    uint32_t mempolicy;
} bam1_t;

#define BAM_CMATCH 0
#define BAM_CINS 1
#define BAM_CDEL 2
#define BAM_CREF_SKIP 3
#define BAM_CSOFT_CLIP 4
#define BAM_CHARD_CLIP 5
#define BAM_CPAD 6
#define BAM_CEQUAL 7
#define BAM_CDIFF 8
#define BAM_CBACK 9
#define BAM_CIGAR_STR "MIDNSHP=XB"

#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024
#define BAM_FSUPPLEMENTARY 2048

#define bam_cigar_op(c) ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)
#define bam_cigar_opchr(c) (BAM_CIGAR_STR[bam_cigar_op(c)])

#define bam_get_qname(b) ((char *)(b)->data)
#define bam_get_cigar(b) ((uint32_t *)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b) \
    ((b)->data + ((b)->core.n_cigar << 2) + (b)->core.l_qname)
#define bam_get_qual(b)                                       \
    ((b)->data + ((b)->core.n_cigar << 2) + (b)->core.l_qname + \
     (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b)                                        \
    ((b)->data + ((b)->core.n_cigar << 2) + (b)->core.l_qname + \
     (((b)->core.l_qseq + 1) >> 1) + (b)->core.l_qseq)
#define bam_get_l_aux(b) \
    ((b)->l_data - ((b)->core.n_cigar << 2) - (b)->core.l_qname - \
     (b)->core.l_qseq - (((b)->core.l_qseq + 1) >> 1))
#define bam_seqi(s, i) ((s)[(i) >> 1] >> ((~(i)&1) << 2) & 0xf)
#define bam_set_seqi(s, i, b)                                     \
    ((s)[(i) >> 1] = ((s)[(i) >> 1] & (0xf0 >> ((~(i)&1) << 2))) | \
                     ((b) << ((~(i)&1) << 2)))

enum htsFormatCategory { unknown_category = 0 };
typedef struct htsFormat {
    int category;
} htsFormat;

extern const char seq_nt16_str[];
extern const unsigned char seq_nt16_table[256];

samFile *sam_open_format(const char *fn, const char *mode,
                         const htsFormat *fmt);
int sam_close(samFile *fp);
sam_hdr_t *sam_hdr_init(void);
void sam_hdr_destroy(sam_hdr_t *h);
int sam_hdr_write(samFile *fp, const sam_hdr_t *h);
int sam_write1(samFile *fp, const sam_hdr_t *h, const bam1_t *b);
bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
int bam_aux_update_int(bam1_t *b, const char tag[2], int64_t val);
int bam_aux_update_str(bam1_t *b, const char tag[2], int len,
                       const char *data);
static inline void bam_set_mempolicy(bam1_t *b, uint32_t policy) {
    b->mempolicy = policy;
}

#ifdef __cplusplus
}
#endif
#endif /* HTSLIB_STUB_SAM_H */
